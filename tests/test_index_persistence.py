"""Persisted ANN index artifacts (sources/ann_index.py): a fitted index
saved to parquet and served by a loader must rank IDENTICALLY to the
session-fit path — the deployment contract that lets a build cluster fit
once and query drivers serve without ever running KMeans."""

from __future__ import annotations

import os

import pytest

from big_data_computing_final_project_spark.plans.registry import all_queries
from big_data_computing_final_project_spark.sources.ann_index import (
    ivf_topk_from_index,
    load_ivf_index,
    load_pq_index,
    pq_topk_from_index,
    save_ivf_index,
    save_pq_index,
)


def test_ivf_index_roundtrip_serves_identically(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf_idx")
    save_ivf_index(spark, sf_dir, idx)
    want = [tuple(r) for r in all_queries()["q64_ann_ivf_topk"](spark, sf_dir).collect()]
    got = [tuple(r) for r in ivf_topk_from_index(spark, idx, sf_dir).collect()]
    assert got == want and len(got) > 0
    # the lists live as one parquet partition per cell — the physical
    # inverted-list layout dynamic partition pruning needs
    parts = [
        d for d in os.listdir(os.path.join(idx, "lists")) if d.startswith("cell=")
    ]
    assert len(parts) > 1


def test_ivf_loaded_centers_match_session_fit(spark, sf_dir, tmp_path):
    from big_data_computing_final_project_spark.plans.similarity import _ivf_fit

    idx = str(tmp_path / "ivf_idx2")
    save_ivf_index(spark, sf_dir, idx)
    centers, lists = load_ivf_index(spark, idx, sf_dir)
    want_centers, assigned = _ivf_fit(spark, sf_dir)
    assert centers == want_centers
    got = sorted(tuple(r) for r in lists.select("vec_id", "cell").collect())
    want = sorted(tuple(r) for r in assigned.select("vec_id", "cell").collect())
    assert got == want


def test_pq_index_roundtrip_serves_identically(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "pq_idx")
    save_pq_index(spark, sf_dir, idx)
    want = [tuple(r) for r in all_queries()["q200_pq_ann_topk"](spark, sf_dir).collect()]
    got = [tuple(r) for r in pq_topk_from_index(spark, idx, sf_dir).collect()]
    assert got == want and len(got) > 0


def test_stale_and_mismatched_indexes_refused(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf_idx3")
    save_ivf_index(spark, sf_dir, idx)
    # a different corpus' bytes: the snapshot guard must refuse
    with pytest.raises(ValueError, match="different embedding bytes"):
        load_ivf_index(spark, idx, "/root/testdata/sf0.01")
    # kind mismatch: an ivf dir is not a pq index
    with pytest.raises(ValueError, match="not pq"):
        load_pq_index(spark, idx, sf_dir)
    # no sf_dir named -> loads without the staleness check (serving boxes
    # that never see the source table)
    centers, _ = load_ivf_index(spark, idx)
    assert len(centers) > 0


def test_store_promotion_serves_identically(spark, sf_dir, tmp_path):
    """The compaction-to-serving handoff: an IVF ingest store promoted to
    the partitioned artifact must serve q64's exact ranking with no
    quantizer run — the full lifecycle ingest → monitor → promote →
    serve."""
    import time

    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.plans.similarity import _ivf_fit
    from big_data_computing_final_project_spark.sources.ann_index import (
        save_ivf_index_from_store,
    )
    from big_data_computing_final_project_spark.streaming.events import (
        run_stream_ivf_assign,
    )

    centers, _ = _ivf_fit(spark, sf_dir)
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).select(
        ["vec_id", "embedding"]
    )
    n = tbl.num_rows
    src = tmp_path / "promo_drops"
    src.mkdir()
    base = time.time() - 3600
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        p = str(src / f"drop_{i}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), p)
        os.utime(p, (base + 10 * i,) * 2)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    store = str(tmp_path / "promo_store")
    run_stream_ivf_assign(stream, centers, store, str(tmp_path / "promo_ckpt"))

    idx = str(tmp_path / "promo_idx")
    save_ivf_index_from_store(spark, sf_dir, store, idx)
    got = [tuple(r) for r in ivf_topk_from_index(spark, idx, sf_dir).collect()]
    want = [tuple(r) for r in all_queries()["q64_ann_ivf_topk"](spark, sf_dir).collect()]
    assert got == want and len(got) > 0


def test_pq_store_promotion_serves_identically(spark, sf_dir, tmp_path):
    """A live PQ ingest store promoted to the persisted artifact serves
    q200's exact ranking with no encode run — the PQ half of the
    compaction-to-serving handoff."""
    import time

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.catalog import load_table
    from big_data_computing_final_project_spark.plans.similarity import (
        _pq_books,
        as_double,
    )
    from big_data_computing_final_project_spark.sources.ann_index import (
        save_pq_index_from_store,
    )
    from big_data_computing_final_project_spark.streaming.events import (
        run_stream_pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    dim = len(emb.select("e").first()["e"])
    books = _pq_books(spark, sf_dir, emb, dim)
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).select(
        ["vec_id", "embedding"]
    )
    n = tbl.num_rows
    src = tmp_path / "pq_promo_drops"
    src.mkdir()
    base = time.time() - 3600
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        p = str(src / f"drop_{i}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), p)
        os.utime(p, (base + 10 * i,) * 2)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    store = str(tmp_path / "pq_promo_store")
    run_stream_pq_encode(stream, books, store, str(tmp_path / "pq_promo_ckpt"))

    idx = str(tmp_path / "pq_promo_idx")
    save_pq_index_from_store(spark, sf_dir, store, idx)
    got = [tuple(r) for r in pq_topk_from_index(spark, idx, sf_dir).collect()]
    want = [tuple(r) for r in all_queries()["q200_pq_ann_topk"](spark, sf_dir).collect()]
    assert got == want and len(got) > 0
