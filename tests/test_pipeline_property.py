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


# -- typed chains: mixed key/value types, 1-4 stages -------------------------
#
# The fixed-type property above exceeds the reference's QuickCheck suite
# in chain shape but not in TYPE shape: the reference's Mapper/Reducer
# are polymorphic in both key and value (``Mapper k1 v1 k2 v2``,
# src/Core/MapReduceC.hs:22-26), and the Spark lowering has real
# type-dependent machinery the fixed test never exercises (per-stage
# DDL schemas, Arrow casts of int->string columns, groupBy over bigint
# keys, map-stage fusion across a type change).  This generator tracks
# the (key_type, value_type) state through the chain and only samples
# stages whose input types match — every generated chain is well-typed
# the way the reference's GADT chain is BY CONSTRUCTION.

_DDL = {"str": "string", "int": "long"}


class _TypedStage:
    def __init__(self, kind, fn, in_kt, in_vt, out_kt, out_vt):
        self.kind, self.fn = kind, fn
        self.in_kt, self.in_vt = in_kt, in_vt  # None = any key type
        self.out_kt, self.out_vt = out_kt, out_vt  # "same" = key type unchanged

    def accepts(self, kt, vt):
        return (self.in_kt is None or self.in_kt == kt) and self.in_vt == vt

    def out_types(self, kt, vt):
        return (kt if self.out_kt == "same" else self.out_kt, self.out_vt)


def _typed_stage_pool():
    # factories (see note above: nested fns serialize by value)
    def explode_digits(k, v):
        # row multiplication AND deletion in one mapper
        return [(k, int(d)) for d in str(abs(v))] if v != 0 else []

    def stringify_val(k, v):
        return [(k, f"v{v}")]

    def val_len(k, v):
        return [(k, len(v))]

    def int_key(k, v):
        return [(len(k), v)]

    def str_key(k, v):
        return [(f"k{k}", v)]

    def keep_short(k, v):
        return [(k, v)] if len(v) <= 4 else []

    def sum_count(k, vs):
        return [sum(vs), len(vs)]

    def concat_sorted(k, vs):
        return [",".join(sorted(vs))]

    def count_only(k, vs):
        return [len(vs)]

    def max_val(k, vs):
        return [max(vs)]

    return [
        _TypedStage("map", explode_digits, None, "int", "same", "int"),
        _TypedStage("map", stringify_val, None, "int", "same", "str"),
        _TypedStage("map", val_len, None, "str", "same", "int"),
        _TypedStage("map", int_key, "str", "int", "int", "int"),
        _TypedStage("map", str_key, "int", "int", "str", "int"),
        _TypedStage("map", keep_short, None, "str", "same", "str"),
        _TypedStage("reduce", sum_count, None, "int", "same", "int"),
        _TypedStage("reduce", concat_sorted, None, "str", "same", "str"),
        _TypedStage("reduce", count_only, None, "str", "same", "int"),
        _TypedStage("reduce", max_val, None, "int", "same", "int"),
    ]


_POOL = _typed_stage_pool()


@st.composite
def typed_chains(draw):
    kt, vt = "str", "int"
    chain = []
    for _ in range(draw(st.integers(min_value=1, max_value=4))):
        stage = draw(st.sampled_from([s for s in _POOL if s.accepts(kt, vt)]))
        kt, vt = stage.out_types(kt, vt)
        chain.append((stage, kt, vt))
    return chain


@settings(
    max_examples=15,  # reference's withMaxSuccess 15
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows, chain=typed_chains())
def test_typed_chain_matches_local_oracle(spark, data, chain):
    pipe = Pipeline()
    for stage, kt, vt in chain:
        schema = f"key {_DDL[kt]}, value {_DDL[vt]}"
        if stage.kind == "map":
            pipe = pipe.map_stage(stage.fn, schema)
        else:
            pipe = pipe.reduce_stage(stage.fn, schema)
    want = sorted(pipe.run_local(data))
    df = spark.createDataFrame(data, "key string, value long") if data else (
        spark.createDataFrame([], "key string, value long")
    )
    got = sorted((r["key"], r["value"]) for r in pipe.run(df).collect())
    assert got == want
