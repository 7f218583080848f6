"""Synthetic transcript generator: determinism, schema, skew, session
structure, and as-of snapshot properties."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fluvio_jolt_spark.sources.transcripts import (
    SESSION_GAP_S,
    generate_asof_snapshots,
    generate_transcripts,
    sf_to_n_turns,
)


@pytest.fixture(scope="module")
def table():
    return generate_transcripts(5000)


def test_deterministic(table):
    again = generate_transcripts(5000)
    assert table.equals(again)


def test_schema(table):
    assert table.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert table.schema.field("turn_idx").type == pa.int32()
    assert table.schema.field("ts").type == pa.timestamp("us")
    assert table.num_rows == 5000


def test_turn_idx_dense_per_conv(table):
    conv = np.array(table.column("conv_id").to_pylist())
    idx = np.array(table.column("turn_idx").to_pylist())
    for c in np.unique(conv)[:20]:
        got = idx[conv == c]
        assert (got == np.arange(len(got))).all()


def test_ts_strictly_increasing_within_conv(table):
    conv = np.array(table.column("conv_id").to_pylist())
    ts = np.array(table.column("ts").cast(pa.int64()).to_pylist())
    for c in np.unique(conv)[:20]:
        got = ts[conv == c]
        assert (np.diff(got) > 0).all()


def test_mega_conversation_skew(table):
    conv = np.array(table.column("conv_id").to_pylist())
    _, counts = np.unique(conv, return_counts=True)
    assert counts.max() >= 0.02 * table.num_rows


def test_session_gaps_present(table):
    conv = np.array(table.column("conv_id").to_pylist())
    ts = np.array(table.column("ts").cast(pa.int64()).to_pylist())
    big_gap = 0
    for c in np.unique(conv):
        got = ts[conv == c]
        if len(got) > 1 and (np.diff(got) > SESSION_GAP_S * 1_000_000).any():
            big_gap += 1
    assert big_gap >= 3, "generator must produce multi-session conversations"


def test_payload_is_bench_shaped(table):
    import json

    rec = json.loads(table.column("text")[0].as_py())
    assert list(rec.keys()) == [
        "_id", "isActive", "balance", "age", "eyeColor", "name", "gender",
        "company", "email", "phone", "friends", "favoriteFruit",
    ]


def test_snapshots_properties(table):
    snaps = generate_asof_snapshots(table)
    assert snaps.schema.names == ["conv_id", "snap_ts", "attr_value"]
    snap_convs = set(snaps.column("conv_id").to_pylist())
    all_convs = set(table.column("conv_id").to_pylist())
    assert snap_convs <= all_convs
    assert len(snap_convs) < len(all_convs), "some conversations must lack snapshots"


def test_sf_mapping():
    assert sf_to_n_turns(0.1) == 600_000
    assert sf_to_n_turns(0.001) == 6_000
