"""Deterministic synthetic transcript generator.

Produces the engine's fact table ``transcripts(conv_id, turn_idx, role, text,
tool, ts)`` at any scale, fully deterministic given ``seed``:

* conversation sizes are Zipf-distributed (a few huge, many tiny), with
  conversation 0 forced to ``mega_turns`` turns — the skew case the engine's
  salted two-phase aggregation must survive;
* inter-turn gaps follow a 2-state regime-switching process (bursty vs idle),
  mirroring the seeded regime-switching series of the reference's
  ``test_clustering.py:8-25`` (free/saturated/stopped speed regimes);
* ~2% of turns are dropped to create turn_idx gaps (exercises gap-fill), and
  text/tool are nullable.

Two construction paths share one per-conversation kernel, so they produce
identical rows:

* :func:`generate_transcripts_pdf` — driver-side pandas (tests, tiny scale);
* :func:`generate_transcripts` — distributed: ``spark.range(n_convs)`` is the
  seed table and each partition synthesizes its conversations inside
  ``mapInPandas`` (Arrow-batched, no driver materialization). This is how a
  10^12-turn table would be generated on a real cluster: parallelism scales
  with the number of conversations, not rows on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_ROLES = np.array(["user", "assistant"])
_TOOLS = np.array(["search", "bash", "python", "browser", "editor"])
_WORDS = np.array(
    "the a of to and in is for on with as by at from or an be this that it "
    "query table row scan join agg window sort merge filter batch stream "
    "spark node lane speed frame mask state rollup tier chunk series gap".split()
)

_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")


def _conv_rng(seed: int, conv_idx: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed * 1_000_003 + conv_idx))


def conv_sizes(n_convs: int, seed: int, mega_turns: int = 0, max_turns: int = 400) -> np.ndarray:
    """Deterministic Zipf-ish turn counts per conversation index."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    sizes = np.minimum(rng.zipf(1.6, size=n_convs) + 2, max_turns).astype(np.int64)
    if mega_turns and n_convs > 0:
        sizes[0] = mega_turns
    return sizes


def _gen_one_conv_arrays(seed: int, conv_idx: int, n_turns: int) -> dict[str, np.ndarray]:
    """Synthesize one conversation as column arrays. Pure function of
    (seed, conv_idx, n_turns) — the single source of truth for both the
    driver-side and distributed paths."""
    rng = _conv_rng(seed, conv_idx)
    # Regime-switching inter-turn gaps: bursty (~3 s) vs idle (~240 s).
    regimes = np.zeros(n_turns, dtype=np.int8)
    switches = rng.random(n_turns) < 0.06
    regimes[0] = rng.integers(0, 2)
    regimes = (regimes[0] + np.cumsum(switches)) % 2
    gaps = np.where(regimes == 0, rng.exponential(3.0, n_turns), rng.exponential(240.0, n_turns))
    offsets_us = np.cumsum(np.maximum(gaps, 0.001)) * 1e6
    start_us = float(rng.integers(0, 30 * 86400)) * 1e6  # within a 30-day span
    ts = _BASE_TS + (start_us + offsets_us).astype("timedelta64[us]")

    roles = _ROLES[np.arange(n_turns) % 2]
    n_words = rng.integers(1, 40, size=n_turns)
    word_ids = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    # python-list slicing: np.split's per-slice array construction was ~40%
    # of the whole generator
    wl = _WORDS[word_ids].tolist()
    ends = np.cumsum(n_words)
    starts = np.concatenate([[0], ends[:-1]])
    texts = np.array(
        [" ".join(wl[s:e]) for s, e in zip(starts, ends)], dtype=object
    )
    # ~1.5% null text
    texts[rng.random(n_turns) < 0.015] = None

    tools = np.full(n_turns, None, dtype=object)
    tool_mask = (roles == "assistant") & (rng.random(n_turns) < 0.3)
    tools[tool_mask] = _TOOLS[rng.integers(0, len(_TOOLS), size=int(tool_mask.sum()))]

    cols = {
        "conv_id": np.full(n_turns, f"conv{conv_idx:08d}", dtype=object),
        "turn_idx": np.arange(n_turns, dtype=np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    }
    # Drop ~2% of turns (never the first) → turn_idx gaps for gap-fill tests.
    if n_turns > 4:
        keep = rng.random(n_turns) >= 0.02
        keep[0] = True
        cols = {k: v[keep] for k, v in cols.items()}
    return cols


def _concat_convs(parts: list[dict[str, np.ndarray]]) -> pd.DataFrame:
    return pd.DataFrame(
        {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    )


def _gen_one_conv(seed: int, conv_idx: int, n_turns: int) -> pd.DataFrame:
    return _concat_convs([_gen_one_conv_arrays(seed, conv_idx, n_turns)])


def generate_transcripts_pdf(
    n_convs: int, seed: int = 42, mega_turns: int = 0, max_turns: int = 400
) -> pd.DataFrame:
    """Driver-side generation for tests/oracle (small n only)."""
    sizes = conv_sizes(n_convs, seed, mega_turns, max_turns)
    parts = [_gen_one_conv(seed, i, int(sizes[i])) for i in range(n_convs)]
    return pd.concat(parts, ignore_index=True)


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    mega_turns: int = 0,
    max_turns: int = 400,
    partitions: int | None = None,
    first_conv: int = 0,
    total_convs: int | None = None,
) -> DataFrame:
    """Distributed generation: one task per slice of conversation ids.

    ``first_conv``/``total_convs`` select a contiguous shard of a larger
    deterministic table: shard k of a ``total_convs`` table produces exactly
    the rows the full generation would for those conversation ids — the
    data-parallel unit an executor owns in a sharded deployment.
    """
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)
    sizes = conv_sizes(total_convs or (first_conv + n_convs), seed, mega_turns, max_turns)
    bc_sizes = spark.sparkContext.broadcast(sizes)

    def gen(batches):
        # accumulate many small conversations into one output frame — one
        # Arrow batch per ~64k rows instead of one per conversation
        target = 65536
        for pdf in batches:
            parts: list[dict[str, np.ndarray]] = []
            acc = 0
            for conv_idx in pdf["id"].to_numpy():
                p = _gen_one_conv_arrays(seed, int(conv_idx), int(bc_sizes.value[conv_idx]))
                parts.append(p)
                acc += len(p["turn_idx"])
                if acc >= target:
                    yield _concat_convs(parts)
                    parts, acc = [], 0
            if parts:
                yield _concat_convs(parts)

    ids = spark.range(first_conv, first_conv + n_convs, numPartitions=partitions)
    return ids.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
