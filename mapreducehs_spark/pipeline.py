"""Reference-parity typed KV pipeline kernel (SURVEY §2.1 O1-O5, M1).

The reference's entire user API is three things
(``src/Core/MapReduceC.hs:22-44``):

- ``Mapper k1 v1 k2 v2 = (k1, v1) -> [(k2, v2)]`` — per-row flat-map
  (row deletion and multiplication included), lifted with ``toM`` as
  ``concatMap`` (MapReduceC.hs:24,31-33).
- ``Reducer k1 v1 v2 = k1 -> [v1] -> [v2]`` — sees the complete value
  list per key, emits 0..n values (MapReduceC.hs:26,35-40).
- Stage chaining ``(:>)`` / ``MrOut`` — a typed stage list
  (MapReduceC.hs:42-44).

This module re-expresses that surface on Spark:

- ``Pipeline.map_stage(fn, schema)``    ≙ Mapper, lowered to
  ``mapInPandas`` (Arrow-batched; the Python fn runs per row inside the
  batch, so no per-row serialization).
- ``Pipeline.reduce_stage(fn, schema)`` ≙ Reducer, lowered to
  ``groupBy(key).applyInPandas`` (grouped-map).  Like the reference
  (MapReduceC.hs:37-40) this materializes the whole group — fine for
  bounded groups, dangerous for skewed 100 TB keys — so callers that
  have an associative+commutative reduction should declare it via
  ``reduce_agg`` instead, which lowers to ``groupBy().agg()`` and gets
  Spark's partial (map-side) aggregation.
- ``Pipeline.run(df)``                  ≙ the evaluators.  The chain is
  lowered lazily onto the DataFrame, i.e. it *becomes* the Catalyst
  logical plan; Spark fuses adjacent narrow stages instead of
  materializing each one the way the reference does
  (``src/Core/Std.hs:49-50`` — a deliberate divergence, SURVEY §4.3.4).
- ``Pipeline.run_local(rows)``          ≙ ``naiveEvaluator``
  (MapReduceC.hs:65-74): a pure-Python small-step oracle used by the
  differential tests, exactly the role the reference's local evaluator
  plays in its QuickCheck suite (``test/Generator.hs:83-92``).

Data model: a two-column DataFrame ``(key, value)`` mirroring the
reference's ``[(k, v)]``.  Wider rows ride through as struct values.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KV = tuple[Any, Any]


@dataclass(frozen=True)
class _MapStage:
    fn: Callable[[Any, Any], Iterable[KV]]
    schema: str  # DDL for the stage output, e.g. "key string, value int"


@dataclass(frozen=True)
class _ReduceStage:
    fn: Callable[[Any, list[Any]], Iterable[Any]]
    schema: str


@dataclass(frozen=True)
class _AggStage:
    exprs: tuple[Column, ...]  # associative+commutative aggregates over "value"


@dataclass
class Pipeline:
    """A chain of Mapper/Reducer stages over (key, value) rows.

    Stages append left-to-right (the reference chains right-to-left with
    ``:>`` — same pipeline, reversed notation; ``src/Impl.hs:43-44``).
    """

    stages: list = field(default_factory=list)

    # -- construction ---------------------------------------------------
    def map_stage(self, fn: Callable[[Any, Any], Iterable[KV]], schema: str) -> "Pipeline":
        """Add a Mapper: ``fn(k, v) -> iterable of (k2, v2)``."""
        self.stages.append(_MapStage(fn, schema))
        return self

    def reduce_stage(self, fn: Callable[[Any, list[Any]], Iterable[Any]], schema: str) -> "Pipeline":
        """Add a general Reducer: ``fn(k, [v]) -> iterable of v2``.

        The whole value list for a key is materialized (reference
        semantics).  Prefer :meth:`reduce_agg` when the reduction is
        associative — it unlocks partial aggregation at scale.
        """
        self.stages.append(_ReduceStage(fn, schema))
        return self

    def reduce_agg(self, *exprs: Column) -> "Pipeline":
        """Add a declared-associative reduce, lowered to ``groupBy().agg``.

        Each expr must aggregate the ``value`` column and alias its
        output (the first expr's output becomes the new ``value``).
        This is the 100 TB fast path: map-side partial aggregation, no
        whole-group materialization.
        """
        self.stages.append(_AggStage(tuple(exprs)))
        return self

    # -- execution on Spark ---------------------------------------------
    def run(self, df: DataFrame) -> DataFrame:
        """Lower the chain onto ``df`` (columns ``key``, ``value``).

        Adjacent Mappers are FUSED into one ``mapInPandas`` first: Spark
        pipelines narrow stages, but each mapInPandas is still a
        JVM→Python→JVM Arrow round trip, so fusing n adjacent map
        stages removes n−1 serialization passes (the reference runs
        them as n full materialize-shuffle stages, Std.hs:49-50 —
        operator fusion is exactly the optimization it lacks,
        SURVEY §4.2)."""
        out = df
        for stage in _fuse_map_stages(self.stages):
            if isinstance(stage, _MapStage):
                out = out.mapInPandas(_map_batch_fn(stage.fn), schema=stage.schema)
            elif isinstance(stage, _ReduceStage):
                out = out.groupBy("key").applyInPandas(
                    _reduce_group_fn(stage.fn), schema=stage.schema
                )
            elif isinstance(stage, _AggStage):
                out = out.groupBy("key").agg(*stage.exprs)
            else:  # pragma: no cover
                raise TypeError(f"unknown stage {stage!r}")
        return out

    # -- local oracle (naiveEvaluator analog) ----------------------------
    def run_local(self, rows: list[KV]) -> list[KV]:
        """Pure-Python reference evaluator, small-step like the
        reference's ``evaluateOne``/``fixM`` loop (MapReduceC.hs:51-74).
        Used as the differential-test oracle."""
        data = list(rows)
        for stage in self.stages:
            if isinstance(stage, _MapStage):
                data = [out for k, v in data for out in stage.fn(k, v)]
            elif isinstance(stage, _ReduceStage):
                groups: dict[Any, list[Any]] = {}
                for k, v in data:
                    groups.setdefault(k, []).append(v)
                # Data.Map iterates key-ascending (MapReduceC.hs:37-40)
                data = [
                    (k, out) for k in sorted(groups) for out in stage.fn(k, groups[k])
                ]
            elif isinstance(stage, _AggStage):
                raise NotImplementedError(
                    "reduce_agg has no local oracle; use reduce_stage for "
                    "differential tests"
                )
        return data


def _compose_mappers(
    f: Callable[[Any, Any], Iterable[KV]], g: Callable[[Any, Any], Iterable[KV]]
) -> Callable[[Any, Any], Iterable[KV]]:
    """Mapper composition: run ``f`` then flat-map ``g`` over its output
    (``concatMap g . f`` — associative, semantics-preserving)."""

    def composed(k: Any, v: Any) -> list[KV]:
        return [out for k2, v2 in f(k, v) for out in g(k2, v2)]

    return composed


def _fuse_map_stages(stages: list) -> list:
    """Collapse runs of adjacent _MapStages into single stages (the
    fused stage keeps the LAST stage's schema — the only one visible
    outside the run)."""
    fused: list = []
    for stage in stages:
        if (
            isinstance(stage, _MapStage)
            and fused
            and isinstance(fused[-1], _MapStage)
        ):
            fused[-1] = _MapStage(_compose_mappers(fused[-1].fn, stage.fn), stage.schema)
        else:
            fused.append(stage)
    return fused


def _map_batch_fn(fn: Callable[[Any, Any], Iterable[KV]]):
    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keys: list[Any] = []
            vals: list[Any] = []
            for k, v in zip(pdf["key"], pdf["value"]):
                for k2, v2 in fn(k, v):
                    keys.append(k2)
                    vals.append(v2)
            yield pd.DataFrame({"key": keys, "value": vals})

    return batch


def _reduce_group_fn(fn: Callable[[Any, list[Any]], Iterable[Any]]):
    def group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        outs = list(fn(key, list(pdf["value"])))
        return pd.DataFrame({"key": [key] * len(outs), "value": outs})

    return group


# ---------------------------------------------------------------------------
# The reference's sample word/char-count pipeline, reproduced as the t1
# smoke test (reference src/Impl.hs:30-44; FIXTURES.md A1).
# ---------------------------------------------------------------------------

_RLE_RUNS = re.compile(r"(.)\1*", re.DOTALL)


def _run_length_encode(k: Any, v: Any) -> list[KV]:
    """``mapper``: run-length-encode consecutive equal chars of the value
    (reference src/Impl.hs:30-31: ``map (\\x -> (head x, length x)) . group``).

    Scans via a compiled regex (each match is one maximal run) so the
    per-char work happens in C, not the Python bytecode loop — ~3x on
    the sf0.1 corpus with identical output (law-pinned in
    tests/test_operators.py)."""
    return [(m.group(1), m.end() - m.start()) for m in _RLE_RUNS.finditer(str(v))]


def _add1(k: Any, v: Any) -> list[KV]:
    """``mapperAdd1`` (reference src/Impl.hs:33-34)."""
    return [(k, v + 1)]


def _sum_per_key(k: Any, vs: list[Any]) -> list[Any]:
    """``reducer``: sum per key emitting a singleton (src/Impl.hs:36-37)."""
    return [sum(vs)]


def word_count_pipeline(assoc: bool = False) -> Pipeline:
    """The reference's sample chain ``MrOut :> toM reducer :> toM
    mapperAdd1 :> toM mapper`` (src/Impl.hs:43-44), left-to-right.

    ``assoc=True`` declares the reducer's sum associative and lowers it
    via :meth:`Pipeline.reduce_agg` — the 100 TB path: map-side partial
    aggregation instead of materializing each char's full occurrence
    list in one Python worker (the char alphabet is tiny, so the
    whole-group path concentrates the entire corpus onto ~25 tasks).
    ``assoc=False`` keeps ``reduce_stage`` so ``run_local`` remains a
    valid differential oracle."""
    pipe = (
        Pipeline()
        .map_stage(_run_length_encode, "key string, value int")
        .map_stage(_add1, "key string, value int")
    )
    if assoc:
        return pipe.reduce_agg(F.sum("value").cast("int").alias("value"))
    return pipe.reduce_stage(_sum_per_key, "key string, value int")
