"""Property-based differential tests for the Pipeline kernel.

The reference's test strategy is QuickCheck: run the distributed stack
on generated input and assert it equals the local evaluator
(``test/Generator.hs:83-92``, sort-before-compare at 86-87).  Here the
same discipline with Hypothesis: generated KV data + generated stage
chains, Spark lowering vs ``run_local``.

Hypothesis settings mirror the reference's ``withMaxSuccess 15``
(Generator.hs:84) — each Spark round trip costs ~1s, so the case count
is deliberately small and deadline is disabled.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducehs_spark.pipeline import Pipeline

# -- generators -------------------------------------------------------------

keys = st.text(alphabet="abcxyz", min_size=0, max_size=3)
vals = st.integers(min_value=-1000, max_value=1000)
rows = st.lists(st.tuples(keys, vals), min_size=0, max_size=30)

# Stage functions are built by factories: functions nested in a factory
# cannot be imported by module+name, so cloudpickle serializes them BY
# VALUE — required because executors cannot import this test module.


def _make_double_and_split():
    def double_and_split(k, v):
        return [(k, v * 2)] if v % 2 == 0 else [(k, v), (k + "x", -v)]

    return double_and_split


def _make_drop_negative():
    def drop_negative(k, v):
        return [(k, v)] if v >= 0 else []

    return drop_negative


def _make_sum_count():
    def sum_count(k, vs):
        return [sum(vs), len(vs)]

    return sum_count


def _make_sorted_vals():
    def sorted_vals(k, vs):
        return sorted(vs)

    return sorted_vals


MAPPERS = [_make_double_and_split(), _make_drop_negative()]
REDUCERS = [_make_sum_count(), _make_sorted_vals()]

pipelines = st.lists(
    st.one_of(
        st.sampled_from(MAPPERS).map(lambda f: ("map", f)),
        st.sampled_from(REDUCERS).map(lambda f: ("reduce", f)),
    ),
    min_size=1,
    max_size=3,
)


def _build(stages) -> Pipeline:
    p = Pipeline()
    for kind, fn in stages:
        if kind == "map":
            p = p.map_stage(fn, "key string, value long")
        else:
            p = p.reduce_stage(fn, "key string, value long")
    return p


# -- the property -----------------------------------------------------------


@settings(
    max_examples=15,  # reference's withMaxSuccess 15
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows, stages=pipelines)
def test_spark_lowering_matches_local_oracle(spark, data, stages):
    pipe = _build(stages)
    want = sorted(pipe.run_local(data))
    df = spark.createDataFrame(data, "key string, value long") if data else (
        spark.createDataFrame([], "key string, value long")
    )
    got = sorted((r["key"], r["value"]) for r in pipe.run(df).collect())
    assert got == want
