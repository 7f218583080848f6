"""Priority sampling and rendezvous sharding — determinism,
weight-proportional selection mass, and the consistent-hashing
stability invariant."""

from __future__ import annotations

import pandas as pd
import pytest

from fluvio_jolt_spark.operators.sampling import priority_sample, rendezvous_shard


@pytest.fixture(scope="module")
def docs(spark):
    n = 400
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(n)),
            # two strata; heavy docs carry 100x the weight of light ones
            "source": ["a" if i % 2 == 0 else "b" for i in range(n)],
            "n_chars": [10_000 if i % 10 == 0 else 100 for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_priority_sample_deterministic_and_k(docs):
    a = priority_sample(docs, "n_chars", k=15, strata_cols=["source"],
                        hash_family="md5").toPandas()
    b = priority_sample(docs, "n_chars", k=15, strata_cols=["source"],
                        hash_family="md5").toPandas()
    key = ["source", "sample_rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("source")["doc_id"].count() == 15).all()
    assert set(a.groupby("source")["sample_rank"].max()) == {15}


def test_priority_sample_weight_proportional(docs):
    """10% of docs hold ~91% of the total weight; a weight-proportional
    top-40-per-stratum sample must over-represent them massively vs
    their 10% population share."""
    out = priority_sample(docs, "n_chars", k=40, strata_cols=["source"],
                          hash_family="xxhash64").toPandas()
    heavy_frac = (out["n_chars"] == 10_000).mean()
    assert heavy_frac > 0.35  # 3.5x+ enrichment over the 10% base rate


def test_priority_sample_drops_nonpositive_weights(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "n_chars": [0, -5, None, 50]})
    pdf["n_chars"] = pdf["n_chars"].astype(object)
    df = spark.createDataFrame(pdf)
    out = priority_sample(df, "n_chars", k=10).toPandas()
    assert list(out["doc_id"]) == [4]


def test_priority_sample_global_no_strata(docs):
    out = priority_sample(docs, "n_chars", k=7).toPandas()
    assert len(out) == 7
    assert sorted(out["sample_rank"]) == list(range(1, 8))


def test_rendezvous_shard_range_and_balance(docs):
    out = rendezvous_shard(docs, "doc_id", n_shards=8,
                           hash_family="md5").toPandas()
    assert out["shard"].between(0, 7).all()
    counts = out.groupby("shard")["doc_id"].count()
    assert len(counts) == 8  # every shard claimed something at n=400
    assert counts.max() < 4 * counts.min()  # roughly balanced


def test_rendezvous_shard_stability_on_growth(docs):
    """THE consistent-hashing invariant: growing 8 -> 9 shards moves
    keys ONLY to the new shard — no key migrates between shards that
    already existed."""
    s8 = rendezvous_shard(docs, "doc_id", n_shards=8,
                          hash_family="md5").toPandas().set_index("doc_id")
    s9 = rendezvous_shard(docs, "doc_id", n_shards=9,
                          hash_family="md5").toPandas().set_index("doc_id")
    moved = s9[s9["shard"] != s8["shard"]]
    assert (moved["shard"] == 8).all()
    # and the moved fraction is in the ~1/9 ballpark, not a reshuffle
    assert 0.02 < len(moved) / len(s8) < 0.30


def test_rendezvous_shard_xxhash_lane_same_shape(docs):
    out = rendezvous_shard(docs, "doc_id", n_shards=4).toPandas()
    assert out["shard"].between(0, 3).all()


def test_rendezvous_shard_rejects_bad_n():
    with pytest.raises(ValueError):
        rendezvous_shard(None, "doc_id", n_shards=0)


# ---------------------------------------------------------------- hash_split

from fluvio_jolt_spark.operators.sampling import hash_split, split_boundaries


def test_hash_split_partitions_everything_once(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                     hash_family="md5").toPandas()
    assert len(out) == 400
    assert set(out["split"]) <= {"train", "val", "test"}
    # proportions in a loose band at n=400
    frac = out["split"].value_counts(normalize=True)
    assert 0.70 < frac["train"] < 0.90
    assert frac.get("val", 0) > 0.03 and frac.get("test", 0) > 0.03


def test_hash_split_invariant_to_partitioning(docs):
    a = (hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                    hash_family="md5")
         .toPandas().set_index("doc_id")["split"])
    b = (hash_split(docs.repartition(7), {"train": 0.8, "val": 0.1,
                                          "test": 0.1}, hash_family="md5")
         .toPandas().set_index("doc_id")["split"])
    assert (a.sort_index() == b.sort_index()).all()


def test_hash_split_xxhash_lane_and_boundaries(docs):
    out = hash_split(docs, {"train": 0.5, "rest": 0.5}).toPandas()
    assert set(out["split"]) == {"train", "rest"}
    bounds = split_boundaries({"train": 0.8, "val": 0.1, "test": 0.1})
    assert [n for n, _ in bounds] == ["train", "val"]
    assert bounds[0][1] == 0.8 and bounds[1][1] == 0.8 + 0.1


def test_hash_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        hash_split(docs, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        hash_split(docs, {})
