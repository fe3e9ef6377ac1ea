"""Deterministic, partition-independent random column expressions.

The reference relies on R's ``set.seed`` discipline (``nb[18]:4,32,39``) for
reproducibility.  ``F.rand``/``F.randn`` are seeded but their streams depend
on partitioning, so a cluster resize changes every draw.  Instead we derive
randomness as a PURE FUNCTION of (key columns, seed, salt) via ``xxhash64``
(SURVEY.md §4.3-4): the same row always gets the same draw, on any cluster,
at any partition count.  All expressions are JVM builtins — whole-stage
codegen, no Python.

uniform:  u = ((xxhash64(key..., salt) & (2^53-1)) + 0.5) / 2^53   ∈ (0,1)
normal:   Box-Muller from two independent uniforms

Two hash streams (``stream=``):

- ``"xxhash64"`` (default) — Spark's JVM-side xxhash64: fastest, but the
  hash itself only reproduces inside Spark.
- ``"md5"`` — the engine-PORTABLE stream used by the sketch family
  (``ops/sketches._hash60`` discipline): the 53-bit integer comes from
  the first 15 hex chars of md5 over ``key1<US>key2<US>...<US>seed:tag``
  (<US> = chr(31)), so any engine with md5 + hex parsing (DuckDB, Trino,
  Postgres) replays every draw bit-for-bit — this is what lets a seeded
  Monte Carlo study be certified against a pure-SQL oracle
  (``mc_nmar_oracle_slice``).  ~2-3x slower than xxhash64; keys are
  hashed through their STRING rendering, so hash integer/string keys.

md5-stream key contract: each key is rendered ``coalesce(cast(k as
string), '<null>')`` before concatenation (``concat_ws`` would otherwise
silently SKIP null columns, letting distinct key tuples collide —
unlike xxhash64, which hashes nulls distinctly).  SQL oracles must
mirror the same coalesce.  Two renderings that themselves contain the
0x1f separator or the literal ``'<null>'`` sentinel can still collide —
use integer / separator-free string keys, as every in-repo caller does.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASK53 = (1 << 53) - 1
_TWO53 = float(1 << 53)
_SEP = "\x1f"  # unit separator between md5-stream key renderings
_NULL_SENTINEL = "<null>"  # md5-stream rendering of a NULL key column
_STREAMS = ("xxhash64", "md5")


def _salt(seed: int, tag: str) -> Column:
    # one literal per (seed, tag) stream; the hash mixes it with the keys
    return F.lit(f"{seed}:{tag}")


def uniform(
    keys: list[Column | str], seed: int, tag: str = "u",
    stream: str = "xxhash64",
) -> Column:
    """Deterministic U(0,1) from the key columns; never exactly 0 or 1."""
    cols = [F.col(c) if isinstance(c, str) else c for c in keys]
    if stream == "xxhash64":
        h = F.xxhash64(*cols, _salt(seed, tag))
    elif stream == "md5":
        # coalesce each rendering: concat_ws skips nulls, which would let
        # (1, null, 2) and (1, 2) draw identically (see module contract)
        rendered = [
            F.coalesce(c.cast("string"), F.lit(_NULL_SENTINEL)) for c in cols
        ]
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(_SEP, *rendered, _salt(seed, tag))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
    else:
        raise ValueError(f"stream must be one of {_STREAMS}; got {stream!r}")
    return (h.bitwiseAND(F.lit(_MASK53)).cast("double") + F.lit(0.5)) / F.lit(_TWO53)


def normal(
    keys: list[Column | str], seed: int, tag: str = "n",
    mean: float = 0.0, sd: float = 1.0, stream: str = "xxhash64",
) -> Column:
    """Deterministic N(mean, sd^2) via Box-Muller."""
    u1 = uniform(keys, seed, tag + ".bm1", stream=stream)
    u2 = uniform(keys, seed, tag + ".bm2", stream=stream)
    z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
    return F.lit(float(mean)) + F.lit(float(sd)) * z


def bernoulli(
    keys: list[Column | str], seed: int, p: Column | float, tag: str = "b",
    stream: str = "xxhash64",
) -> Column:
    """Deterministic Bernoulli(p) indicator (int 0/1) — the Poisson-sampling
    primitive (reference ``nb[7]:69,77``)."""
    pc = F.lit(float(p)) if isinstance(p, (int, float)) else p
    return (uniform(keys, seed, tag, stream=stream) < pc).cast("int")
