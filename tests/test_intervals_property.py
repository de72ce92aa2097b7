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
