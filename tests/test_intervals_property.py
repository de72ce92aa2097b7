"""Property tests: merge_intervals and binned_auc vs pure-Python models."""
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import merge_intervals
from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import binned_auc

# (key, start, length) triples; ends derive as start + length (>= start,
# so intervals are always well-formed)
intervals_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=30,
)


def model_islands(rows):
    """Sweep model: per key, sort by (start, oid), grow islands by
    running max end; touching merges."""
    by_key = {}
    for oid, (k, s, ln) in enumerate(rows):
        by_key.setdefault(k, []).append((s, s + ln, oid))
    out = set()
    for k, ivs in by_key.items():
        ivs.sort(key=lambda t: (t[0], t[2]))
        cur_s, cur_e, n = None, None, 0
        for s, e, _ in ivs:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    out.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        out.add((k, cur_s, cur_e, n))
    return out


@pytest.mark.slow
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=intervals_st)
def test_merge_intervals_matches_sweep_model(spark, rows):
    data = [(k, s, s + ln, oid) for oid, (k, s, ln) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, s bigint, e bigint, oid bigint")
    got = {
        (r.k, r.island_start, r.island_end, r.n_rows)
        for r in merge_intervals(df, "k", "s", "e", "oid").collect()
    }
    assert got == model_islands(rows)


scores_st = st.lists(
    st.tuples(st.integers(min_value=-10, max_value=10), st.booleans()),
    min_size=2,
    max_size=60,
).filter(lambda xs: any(p for _, p in xs) and any(not p for _, p in xs))


def model_auc(pairs):
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    # integer 2U to avoid float accumulation in the model itself
    u2 = sum(2 if sp > sn else (1 if sp == sn else 0) for sp in pos for sn in neg)
    return u2, len(pos), len(neg), u2 / (2 * len(pos) * len(neg))


@pytest.mark.slow
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pairs=scores_st)
def test_binned_auc_matches_quadratic_model(spark, pairs):
    df = spark.createDataFrame(pairs, "score bigint, positive boolean")
    row = binned_auc(df, "score", "positive").collect()[0]
    u2, n_pos, n_neg, auc = model_auc(pairs)
    assert (row.u2, row.n_pos, row.n_neg) == (u2, n_pos, n_neg)
    assert row.auc == auc  # one IEEE division of the same ints both sides


# random batch assignment (0-2) per interval row: ANY split of the
# stream into drains must leave the same state as one drain of the union
drain_split_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=20,
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=drain_split_st)
def test_islands_drain_any_split_equals_union(spark, tmp_path_factory, rows):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_islands_drain

    data = [(k, s, s + ln, oid, b) for oid, (k, s, ln, b) in enumerate(rows)]
    schema = "k string, s bigint, e bigint, oid bigint, b int"
    df = spark.createDataFrame(data, schema)
    root = tmp_path_factory.mktemp("islprop")
    cat = Catalog(spark, str(root / "split"))
    ep = 0
    for b in range(3):
        batch = df.filter(f"b = {b}").drop("b")
        if batch.count() == 0:
            continue
        ep += 1
        run_islands_drain(cat, batch, epoch=ep, key_col="k", start_col="s",
                          end_col="e", order_col="oid", interval_spec="p")
    cat1 = Catalog(spark, str(root / "one"))
    run_islands_drain(cat1, df.drop("b"), epoch=1, key_col="k", start_col="s",
                      end_col="e", order_col="oid", interval_spec="p")
    got = sorted(map(tuple, cat.table("interval_islands").read().collect()))
    want = sorted(map(tuple, cat1.table("interval_islands").read().collect()))
    assert got == want
