"""Deterministic synthetic transcript tables (the north-rule input).

Schema per BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string (JSON),
  tool:string (JSON or ""), ts:timestamp

plus the as-of right side (slowly-changing per-conversation snapshots):
  conv_id:string, snap_ts:timestamp, attr_value:double

Generation is fully vectorized numpy (seed=42 convention, FIXTURES.md),
written once to parquet and cached; Spark then reads parquet so scans
exercise the same pushdown/pruning path as a real table. Conversation
lengths are heavy-tailed with a forced mega-conversation so skew
handling is exercised at every scale.

The `text` payload reproduces the reference benchmark record shape
(/root/reference/fluvio-jolt/benches/input.json) so the reference's
benches/spec.json pipeline applies verbatim.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
GENERATOR_VERSION = 4
BASE_TS_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in micros
SESSION_GAP_S = 30 * 60

_FIRST = ["John", "Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Leslie"]
_LAST = ["Smith", "Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth", "Lamport"]
_COMPANIES = ["Comp", "Initech", "Globex", "Umbrella", "Hooli", "Stark"]
_COLORS = ["green", "blue", "brown", "hazel"]
_FRUITS = ["banana", "apple", "cherry", "kiwi"]
_TOOLS = ["search", "calculator", "browser", "code_exec"]
_ROLES = np.array(["user", "assistant", "tool", "system"])


def default_cache_dir() -> Path:
    return Path(os.environ.get("SPARK_GRAFT_CACHE", Path(__file__).resolve().parents[2] / ".cache"))


def sf_to_n_turns(sf: float) -> int:
    """Scale factor → turn count, matching lineitem's ~6M rows/sf density."""
    return max(int(sf * 6_000_000), 200)


def _conversation_lengths(rng: np.random.RandomState, n_turns: int) -> np.ndarray:
    """Heavy-tailed (Pareto) lengths + one forced mega-conversation
    holding ~3% of all turns, so windows over conv_id always see skew."""
    mega = max(int(0.03 * n_turns), 50)
    lengths = [mega]
    total = mega
    # draw in blocks to stay vectorized
    while total < n_turns:
        block = np.minimum((rng.pareto(1.3, size=4096) + 1.0) * 6.0, 4000.0).astype(np.int64)
        block = np.maximum(block, 2)
        lengths.append(block)
        total += int(block.sum())
    lengths = np.concatenate([np.array([mega], dtype=np.int64)] + [b for b in lengths[1:]])
    # trim to exactly n_turns
    cum = np.cumsum(lengths)
    cut = int(np.searchsorted(cum, n_turns))
    lengths = lengths[: cut + 1].copy()
    lengths[-1] -= int(cum[cut] - n_turns) if cut < len(cum) else 0
    if lengths[-1] <= 0:
        lengths = lengths[:-1]
    return lengths


def _payload_texts(
    rng: np.random.RandomState, conv_ids: np.ndarray, turn_idx: np.ndarray
) -> list[str]:
    n = len(turn_idx)
    first = rng.randint(0, len(_FIRST), size=n)
    last = rng.randint(0, len(_LAST), size=n)
    comp = rng.randint(0, len(_COMPANIES), size=n)
    color = rng.randint(0, len(_COLORS), size=n)
    fruit = rng.randint(0, len(_FRUITS), size=n)
    age = rng.randint(18, 80, size=n)
    active = rng.randint(0, 2, size=n)
    balance = rng.randint(100, 1_000_000, size=n)
    n_friends = rng.randint(0, 6, size=n)
    hexid = rng.randint(0, 1 << 32, size=n, dtype=np.uint64)

    texts = []
    for i in range(n):
        name = f"{_FIRST[first[i]]} {_LAST[last[i]]}"
        hid = int(hexid[i])
        friends = [
            {"id": j, "name": f"{_FIRST[(first[i] + j + 1) % len(_FIRST)]} {_LAST[(last[i] + j) % len(_LAST)]}"}
            for j in range(n_friends[i])
        ]
        rec = {
            "_id": f"{hid:016x}{int(turn_idx[i]) & 0xFFFFFFFF:08x}",
            "isActive": bool(active[i]),
            "balance": f"${balance[i] / 100:,.2f}",
            "age": int(age[i]),
            "eyeColor": _COLORS[color[i]],
            "name": name,
            "gender": "male" if first[i] % 2 == 0 else "female",
            "company": _COMPANIES[comp[i]],
            "email": f"{name.replace(' ', '.').lower()}@example.com",
            "phone": f"+1 (555) {hid % 900 + 100:03d}-{hid % 9000 + 1000:04d}",
            "friends": friends,
            "favoriteFruit": _FRUITS[fruit[i]],
        }
        texts.append(json.dumps(rec, separators=(",", ":"), ensure_ascii=False))
    return texts


def generate_transcripts(n_turns: int, seed: int = SEED) -> "pa.Table":
    rng = np.random.RandomState(seed)
    lengths = _conversation_lengths(rng, n_turns)
    n_convs = len(lengths)
    n = int(lengths.sum())

    conv_ord = np.repeat(np.arange(n_convs), lengths)
    # dense 0-based turn index per conversation
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(starts, lengths)).astype(np.int32)

    conv_names = np.array([f"conv_{i:08d}" for i in range(n_convs)])
    conv_id = conv_names[conv_ord]

    # roles: mostly alternating user/assistant, ~8% tool, ~2% system,
    # ~5% repeats of the previous role
    base = np.where(turn_idx % 2 == 0, 0, 1)  # user/assistant alternation
    r = rng.rand(n)
    role_idx = base.copy()
    role_idx[r < 0.08] = 2
    role_idx[(r >= 0.08) & (r < 0.10)] = 3
    repeat_mask = (rng.rand(n) < 0.05) & (turn_idx > 0)
    role_idx[repeat_mask] = np.roll(role_idx, 1)[repeat_mask]
    role = _ROLES[role_idx]

    # timestamps: strictly increasing within a conversation; gap mixture
    # with ~4% super-threshold gaps → multi-session conversations
    gaps = rng.randint(5, 240, size=n).astype(np.int64)
    big = rng.rand(n) < 0.04
    gaps[big] = rng.randint(SESSION_GAP_S + 60, SESSION_GAP_S * 6, size=int(big.sum()))
    conv_start = rng.randint(0, 30 * 24 * 3600, size=n_convs).astype(np.int64)
    gaps[np.repeat(starts, lengths) == np.arange(n)] = 0  # first turn: no gap
    # per-conversation cumulative sum of gaps
    cum = np.cumsum(gaps)
    base_cum = np.repeat(cum[starts], lengths)
    within = cum - base_cum
    ts_us = BASE_TS_US + (np.repeat(conv_start, lengths) + within) * 1_000_000

    # tool calls: ~85% of 'tool' turns and ~10% of assistant turns
    tool_mask = (role == "tool") | ((role == "assistant") & (rng.rand(n) < 0.10))
    tool_name_idx = rng.randint(0, len(_TOOLS), size=n)
    tool_arg = rng.randint(0, 1000, size=n)
    tool = np.array([
        json.dumps({"name": _TOOLS[tool_name_idx[i]], "args": {"q": int(tool_arg[i])}},
                   separators=(",", ":"))
        if tool_mask[i] else ""
        for i in range(n)
    ], dtype=object)

    texts = _payload_texts(rng, conv_id, turn_idx)

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )


def generate_asof_snapshots(transcripts: "pa.Table", seed: int = SEED) -> "pa.Table":
    """Sparse per-conversation attribute snapshots for point-in-time
    joins: ~70% of conversations have 1-5 snapshots; some snapshots tie
    exactly with a turn ts (pinning <= semantics) and some land after the
    last turn (must never join)."""
    import pyarrow.compute as pc

    rng = np.random.RandomState(seed + 1)
    conv = transcripts.column("conv_id").to_numpy(zero_copy_only=False)
    ts = transcripts.column("ts").cast(pa.int64()).to_numpy()

    convs, first_pos = np.unique(conv, return_index=True)
    order = np.argsort(first_pos)
    convs = convs[order]
    # min/max ts per conversation
    df_min: dict[str, tuple[int, int]] = {}
    # conv array is grouped by construction; compute boundaries
    first_pos_sorted = np.sort(first_pos)
    bounds = np.append(first_pos_sorted, len(conv))

    rows_conv: list[str] = []
    rows_ts: list[int] = []
    rows_val: list[float] = []
    for i, c in enumerate(convs):
        lo, hi = bounds[i], bounds[i + 1]
        if rng.rand() > 0.7:
            continue  # no snapshots → null/backfill path
        t0, t1 = int(ts[lo]), int(ts[hi - 1])
        k = rng.randint(1, 6)
        for j in range(k):
            if j == 0 and rng.rand() < 0.3 and hi - lo > 2:
                snap = int(ts[lo + rng.randint(0, hi - lo)])  # exact tie with a turn
            elif rng.rand() < 0.1:
                snap = t1 + rng.randint(60, 3600) * 1_000_000  # after last turn
            else:
                snap = t0 + int(rng.rand() * max(t1 - t0, 1))
            rows_conv.append(c)
            rows_ts.append(snap)
            # deterministic value so oracles can recompute it
            rows_val.append(round((hash_u64(c) % 10_000) / 100.0 + snap % 97, 4))

    return pa.table(
        {
            "conv_id": pa.array(rows_conv, pa.string()),
            "snap_ts": pa.array(np.array(rows_ts, dtype=np.int64), pa.timestamp("us")),
            "attr_value": pa.array(rows_val, pa.float64()),
        }
    )


def hash_u64(s: str) -> int:
    """Deterministic 64-bit FNV-1a (never use Python's salted hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def materialize(n_turns: int, cache_dir: Path | None = None, seed: int = SEED) -> tuple[Path, Path]:
    """Generate (or reuse cached) transcript + snapshot parquet files;
    returns (transcripts_path, snapshots_path)."""
    cache = Path(cache_dir) if cache_dir else default_cache_dir()
    cache.mkdir(parents=True, exist_ok=True)
    tag = f"v{GENERATOR_VERSION}_n{n_turns}_s{seed}"
    tpath = cache / f"transcripts_{tag}.parquet"
    spath = cache / f"asof_snapshots_{tag}.parquet"
    if not (tpath.exists() and spath.exists()):
        table = generate_transcripts(n_turns, seed)
        # shard the table directory so the scan parallelizes regardless
        # of spark.sql.files.maxPartitionBytes (a single multi-GB file
        # caps input tasks at its row-group count); conv boundaries are
        # irrelevant — shards split anywhere
        tmp = cache / (tpath.name + ".tmp")
        tmp.mkdir(parents=True, exist_ok=True)
        n_shards = max(8, min(64, n_turns // 50_000 or 8))
        rows = table.num_rows
        step = (rows + n_shards - 1) // n_shards
        for i in range(n_shards):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, tmp / f"part-{i:04d}.parquet", row_group_size=32_000)
        tmp.rename(tpath)
        pq.write_table(generate_asof_snapshots(table, seed), spath)
    return tpath, spath


def read_transcripts(spark, n_turns: int, cache_dir: Path | None = None, seed: int = SEED):
    """Spark entry: materialize to parquet then read — the scan goes
    through the normal columnar/pushdown path, standing in for an
    Iceberg table scan (jars not available in this sandbox; the
    interface is source-format-agnostic)."""
    from ..functions.epoch import ensure_ltz

    tpath, spath = materialize(n_turns, cache_dir, seed)
    # The cache stores naive micros; normalize to instants (UTC wall
    # clock) so downstream temporal ops work under a stock session where
    # parquet naive timestamps infer as TIMESTAMP_NTZ.
    turns = ensure_ltz(spark.read.parquet(str(tpath)), "ts")
    snaps = ensure_ltz(spark.read.parquet(str(spath)), "snap_ts")
    return turns, snaps
