"""Deterministic transcript-table synthesizer (FIXTURES.md §1).

Generates the authoritative input schema (BASELINE.json input_hint):

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string|null, ts timestamp)

Everything is seeded (``numpy.random.default_rng(seed)``), draws happen in a
fixed column order, and the emitted rows are SHUFFLED with a seeded
permutation so downstream tests prove stable turn ordering rather than
relying on physical row order.

Scale note: the generator is numpy-vectorized and builds one pandas frame;
it is meant for test/bench tiers (<= tens of millions of turns on the bench
host). The production input is an Iceberg table (io.load_transcripts) — this
module exists because the sandbox has no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .io import TRANSCRIPT_SCHEMA

BASE_TS = np.datetime64("2026-01-01T00:00:00")


def synth_transcripts_pdf(
    n_conversations: int = 50,
    seed: int = 42,
    max_turns: int = 200,
    n_agents: int = 20,
    n_tools: int = 12,
    tool_null_p: float = 0.8,
) -> pd.DataFrame:
    """Build the transcript table as a pandas frame, deterministically.

    - turns per conv ~ Zipf(a=1.5) clipped to [2, max_turns] (hub/long-tail
      skew fixture);
    - roles: per-conv cast of 2-4 drawn from {user, assistant, agent00..};
      turns alternate through the cast;
    - tool: null with p=tool_null_p else Zipf-weighted tool00..toolNN
      (tool00 is the hub);
    - ts: BASE_TS + conv offset + turn_idx seconds, strictly increasing per
      conv;
    - rows returned in a seeded SHUFFLED order.
    """
    rng = np.random.default_rng(seed)

    # -- per-conversation draws (fixed order: turns, cast, tools) ----------
    n_turns = np.clip(rng.zipf(1.5, size=n_conversations), 2, max_turns).astype(np.int64)
    total = int(n_turns.sum())

    roles_vocab = np.array(
        ["user", "assistant"] + [f"agent{i:02d}" for i in range(n_agents)]
    )
    cast_sizes = rng.integers(2, 5, size=n_conversations)
    # Cast member draws, one row of indices per conversation (padded draw so
    # the number of rng consumptions is fixed regardless of cast size).
    cast_draw = rng.integers(0, len(roles_vocab), size=(n_conversations, 4))

    conv_ids = np.repeat(np.arange(n_conversations), n_turns)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int64) for n in n_turns])

    # role = cast[turn_idx % cast_size] per conversation
    cast_size_rep = cast_sizes[conv_ids]
    cast_pos = (turn_idx % cast_size_rep).astype(np.int64)
    role_idx = cast_draw[conv_ids, cast_pos]
    roles = roles_vocab[role_idx]

    # tool column: null with p, else zipf-weighted tool index
    tool_mask = rng.random(total) >= tool_null_p  # True => has tool
    tool_ranks = np.minimum(rng.zipf(1.8, size=total), n_tools) - 1
    tools = np.where(tool_mask, np.char.add("tool", np.char.zfill(tool_ranks.astype(str), 2)), None)

    conv_id_str = np.char.add("c", np.char.zfill(conv_ids.astype(str), 6))

    ts = BASE_TS + (conv_ids * 100_000 + turn_idx).astype("timedelta64[s]")

    text = np.char.add(
        np.char.add(np.char.add(conv_id_str, ":"), turn_idx.astype(str)),
        np.char.add(":", roles.astype(str)),
    )

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id_str,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": text,
            "tool": pd.array(tools, dtype=object),
            "ts": pd.Series(ts),
        }
    )
    # Seeded shuffle so physical order never equals logical order.
    perm = rng.permutation(total)
    return pdf.iloc[perm].reset_index(drop=True)


def synth_transcripts(spark: SparkSession, n_conversations: int = 50, seed: int = 42, **kw) -> DataFrame:
    """Spark DataFrame over the synthesized table with the declared schema."""
    pdf = synth_transcripts_pdf(n_conversations=n_conversations, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def micro_transcripts(spark: SparkSession, name: str) -> DataFrame:
    """Golden micro-graph fixtures (FIXTURES.md §3), hand-written rows."""
    rows = {
        "tri3": [("c0", i, r, None) for i, r in enumerate(["A", "B", "C", "A"])],
        "path4": [("c0", i, r, None) for i, r in enumerate(["A", "B", "C", "D"])],
        "two2cycles": [("c0", i, r, None) for i, r in enumerate(["A", "B", "A"])]
        + [("c1", i, r, None) for i, r in enumerate(["C", "D", "C"])],
        "star_hub": [
            (f"c{k}", i, r, None)
            for k in range(64)
            for i, r in enumerate([f"leaf{k:02d}", "HUB"])
        ],
        "dup_self": [
            ("c0", i, r, "tool00") for i, r in enumerate(["A", "A", "B", "A", "B"])
        ],
    }[name]
    from datetime import datetime, timedelta

    base = datetime(2026, 1, 1)
    data = [
        (conv, int(idx), role, f"{conv}:{idx}:{role}", tool, base + timedelta(seconds=idx))
        for conv, idx, role, tool in rows
    ]
    return spark.createDataFrame(data, schema=TRANSCRIPT_SCHEMA)
