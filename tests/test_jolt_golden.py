"""Replay the reference's 66 golden fixtures through the pure-Python
Jolt core; tree equality matches the reference's own assertion
(serde_json Value equality — order-insensitive for object keys)."""

from __future__ import annotations

import json

import pytest

from fluvio_jolt_spark.jolt import transform

from jolt_fixtures import fixture_params, reference_available

PARAMS = fixture_params()


@pytest.mark.skipif(not reference_available(), reason="reference fixture corpus not present")
@pytest.mark.parametrize("fid,fixture", PARAMS, ids=[p[0] for p in PARAMS])
def test_golden_fixture(fid, fixture):
    got = transform(fixture.input, fixture.spec)
    assert got == fixture.expected, (
        f"{fid}:\nexpected={json.dumps(fixture.expected, indent=2)}\n"
        f"got={json.dumps(got, indent=2)}"
    )


@pytest.mark.skipif(not reference_available(), reason="reference fixture corpus not present")
def test_corpus_size():
    # 9 integration + 55 java shift + 2 data shift = 66
    assert len(PARAMS) == 66


@pytest.mark.skipif(not reference_available(), reason="reference fixture corpus not present")
@pytest.mark.parametrize("fid,fixture", PARAMS, ids=[p[0] for p in PARAMS])
def test_golden_fixture_string_path(fid, fixture):
    """The string-in/string-out path (orjson fast lane when available)
    must produce byte-identical canonical JSON to the stdlib serializer."""
    from fluvio_jolt_spark.jolt.transform import transform_json

    got = transform_json(json.dumps(fixture.input), json.dumps(fixture.spec))
    want = json.dumps(
        transform(fixture.input, fixture.spec), separators=(",", ":"), ensure_ascii=False
    )
    assert got == want
