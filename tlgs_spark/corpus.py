"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Shape pinned by BASELINE.json input_hint:
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``.

Determinism contract: every conversation ``i`` is generated from
``default_rng(SEED * 1_000_003 + i)`` only — so any two corpora agree
row-for-row on their common prefix of conversations (the north-rule
"per-turn text equality under stable turn ordering" invariant), and the
distributed generator (mapInPandas over conv-index ranges) is
bit-identical to the driver-side pandas generator.

Text is Zipf(s≈1.1)-sampled from a 5,000-word vocabulary (hot-term skew
for the salting/sharding path), with planted rare "marker" terms for
exact-hit tests and occasional separator/ASCII-art lines to exercise
the hygiene rules (tlgsutils/utils.cpp:25-60 analog).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
ROLES = ["user", "assistant", "tool"]
TOOLS = ["bash", "search", "editor"]
MARKER_EVERY = 97  # conv i with i % 97 == 0 gets marker term in turn 1
EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

_VOCAB: list[str] | None = None
_ZIPF_P: np.ndarray | None = None


def vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = [f"tok{j:04d}" for j in range(VOCAB_SIZE)]
    return _VOCAB


def zipf_probs() -> np.ndarray:
    global _ZIPF_P
    if _ZIPF_P is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** (-ZIPF_S)
        _ZIPF_P = p / p.sum()
    return _ZIPF_P


def marker_term(i: int) -> str:
    return f"marker{i // MARKER_EVERY:03d}"


_VOCAB_ARR: np.ndarray | None = None


def _vocab_arr() -> np.ndarray:
    global _VOCAB_ARR
    if _VOCAB_ARR is None:
        _VOCAB_ARR = np.array(vocab())
    return _VOCAB_ARR


def _conv_frame(i: int) -> pd.DataFrame:
    """One conversation. Vectorized: a single Zipf draw for all turns,
    sliced per turn (draw order is identical to per-turn draws only
    because it is pinned here — this function IS the determinism spec)."""
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    n_turns = int(rng.integers(2, 41))
    v = _vocab_arr()
    p = zipf_probs()
    role_off = i % 3
    n_toks = rng.integers(5, 201, size=n_turns)
    junk = rng.integers(0, 7, size=n_turns)
    tool_pick = rng.integers(0, 3, size=n_turns)
    all_idx = rng.choice(VOCAB_SIZE, size=int(n_toks.sum()), p=p)
    bounds = np.concatenate(([0], np.cumsum(n_toks)))
    words = v[all_idx]
    rows = []
    for t in range(n_turns):
        text = " ".join(words[bounds[t] : bounds[t + 1]])
        if i % MARKER_EVERY == 0 and t == 1:
            text = text + " " + marker_term(i)
        if junk[t] == 0:
            text = text + "\n" + "----"
        elif junk[t] == 1:
            text = "████" + "\n" + text
        role = ROLES[(role_off + t) % 3]
        tool = TOOLS[int(tool_pick[t])] if role == "tool" else None
        ts = EPOCH + dt.timedelta(minutes=i * 3 + t)
        rows.append((f"conv{i:06d}", t, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def generate_pandas(n_conv: int, start: int = 0) -> pd.DataFrame:
    """Driver-side generation (tests / small corpora)."""
    frames = [_conv_frame(i) for i in range(start, start + n_conv)]
    out = pd.concat(frames, ignore_index=True)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def generate_spark(spark, n_conv: int, partitions: int | None = None):
    """Distributed generation: conv-index range → mapInPandas.

    Scales to any corpus size (each task generates its own conversation
    range; no driver materialization) and is row-identical to
    :func:`generate_pandas` by construction.
    """
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rng_df = spark.range(0, n_conv, 1, partitions).withColumnRenamed("id", "conv_i")

    def gen(batches):
        for pdf in batches:
            for i in pdf["conv_i"].tolist():
                yield _conv_frame(int(i))

    return rng_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def write_corpus(spark, n_conv: int, path: str, partitions: int | None = None) -> None:
    generate_spark(spark, n_conv, partitions).write.mode("overwrite").parquet(path)
