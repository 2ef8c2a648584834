"""Property-based checks for the versioned lake's CDC + fold algebra:
over RANDOM tables and merge batches, read_changes must equal the
brute-force row diff, and the incremental fold must equal the
full-refresh aggregate. Few examples, tiny frames — every example
runs real commits."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tcrd_spark.sources import incremental as inc
from tcrd_spark.sources import snapshots as snap

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
    derandomize=True,
)

GRPS = ["A", "B", "C"]

# v1: keys 0..k-1 with a group and an integer-valued double
base_strategy = st.lists(
    st.tuples(st.sampled_from(GRPS), st.integers(0, 9)),
    min_size=1, max_size=12,
)
# batch: (key, value, delete?) — keys may be existing or new
batch_strategy = st.lists(
    st.tuples(
        st.integers(0, 17),
        st.integers(10, 19),
        st.booleans(),
    ),
    min_size=0, max_size=10,
    unique_by=lambda t: t[0],
)


def _brute_diff(v1, v2):
    """Expected change set from two {key: (grp, val)} dicts."""
    out = []
    for k in v2:
        if k not in v1:
            out.append(("insert", k, *v2[k]))
        elif v1[k] != v2[k]:
            out.append(("update_pre", k, *v1[k]))
            out.append(("update_post", k, *v2[k]))
    for k in v1:
        if k not in v2:
            out.append(("delete", k, *v1[k]))
    return sorted(out)


@given(base=base_strategy, batch=batch_strategy)
@SETTINGS
def test_cdc_and_fold_equal_brute_force(spark, tmp_path_factory, base, batch):
    import uuid

    table = str(tmp_path_factory.mktemp("lake") / uuid.uuid4().hex[:8])
    v1 = {i: (g, float(v)) for i, (g, v) in enumerate(base)}
    rows1 = [(k, g, v) for k, (g, v) in v1.items()]
    df1 = spark.createDataFrame(rows1, "k long, grp string, val double")
    snap.create_table(df1, table, "grp")

    # existing keys keep their partition value (the COW contract);
    # new keys land in a group derived from the key
    src_rows = []
    for k, v, dele in batch:
        grp = v1[k][0] if k in v1 else GRPS[k % 3]
        src_rows.append((k, grp, -1.0 if dele else float(v)))
    if not src_rows:
        return
    src = spark.createDataFrame(src_rows, "k long, grp string, val double")
    snap.merge_version(
        spark, table, src.select("k", "grp", "val"), ["k"],
        delete_condition="s.val < 0",
    )

    # expected v2 state
    v2 = dict(v1)
    for k, grp, val in src_rows:
        if val < 0:
            if k in v2:
                del v2[k]
        else:
            v2[k] = (grp, val)
    # note: an unmatched DELETE row still INSERTS (delete_condition
    # only applies to matched rows — merge_frames semantics)
    for k, grp, val in src_rows:
        if val < 0 and k not in v1:
            v2[k] = (grp, val)

    feed = snap.read_changes(spark, table, 1, 2, ["k"])
    got = sorted(
        (r["change_type"], r["k"], r["grp"], r["val"])
        for r in feed.collect()
    )
    assert got == _brute_diff(v1, v2)

    folded = inc.incremental_group_agg(
        spark, table, 1, 2, ["k"], "grp", "val"
    )
    want = inc.group_agg(snap.read_version(spark, table, 2), "grp", "val")
    g = {r["grp"]: (r["n"], r["s"]) for r in folded.collect()}
    w = {r["grp"]: (r["n"], r["s"]) for r in want.collect()}
    assert g == w
