#!/usr/bin/env python
"""Interleaved same-session A/B of the r15 multimodal vectorization.

Old path = r14 per-image Python loops (RandomState per doc, per-image 2-D
DCT, 63-step bit fold). New path = the r15 module code (memoized base
images, stacked matmul DCT, vectorized packbits). Measures the generate +
phash mapInPandas stage in isolation (noop-sink count), alternating
OLD/NEW x N rounds, and verifies the hash outputs are IDENTICAL row sets.
"""
import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from dp_dimension_importer_spark.catalog import load_tables  # noqa: E402
from dp_dimension_importer_spark.operators import multimodal as MM  # noqa: E402
from dp_dimension_importer_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))


def old_gen_hash(docs):
    """r14 code, verbatim: per-doc RandomState + per-image DCT/bit fold."""
    dec, rez = MM.decode_image, MM.resize_nearest

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 100
                img = np.random.RandomState(k).randint(
                    0, 256, (16, 16)
                ).astype(np.uint8)
                d = int(doc_id)
                img[d % 16, (d // 16) % 16] ^= 7
                img[(d * 7) % 16, (d * 13) % 16] ^= 5
                payloads.append(b"P5 16 16 255\n" + img.tobytes())
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        N = 32
        n_idx = np.arange(N)
        k_idx = np.arange(N)[:, None]
        C = np.sqrt(2.0 / N) * np.cos(
            np.pi * (2 * n_idx[None, :] + 1) * k_idx / (2 * N)
        )
        C[0] = np.sqrt(1.0 / N)
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                try:
                    img = dec(bytes(payload))
                    if img.ndim == 3:
                        img = img.astype(np.uint16).mean(
                            axis=2, dtype=np.float64
                        ).astype(np.uint8)
                    g = rez(img, N, N).astype(np.float64)
                    d = C @ g @ C.T
                    block = d[:8, :8].flatten()[1:]
                    med = np.partition(block.copy(), 31)[31]
                    h = 0
                    for v in block:
                        h = (h << 1) | int(v > med)
                    if h >= 1 << 63:
                        h -= 1 << 64
                    out.append(h)
                except (NotImplementedError, ValueError, IndexError):
                    out.append(None)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "phash": pd.array(out, "Int64")}
            )

    assets = docs.mapInPandas(_gen, "asset_id long, payload binary")
    return assets.mapInPandas(_hash, "asset_id long, phash long")


def new_gen_hash(docs, spark, sf_dir):
    """The committed r15 module code (gen from the registered query shape)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = {}
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 100
                img = base.get(k)
                if img is None:
                    img = base[k] = np.random.RandomState(k).randint(
                        0, 256, (16, 16)
                    ).astype(np.uint8)
                img = img.copy()
                d = int(doc_id)
                img[d % 16, (d // 16) % 16] ^= 7
                img[(d * 7) % 16, (d * 13) % 16] ^= 5
                payloads.append(b"P5 16 16 255\n" + img.tobytes())
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    assets = docs.mapInPandas(_gen, "asset_id long, payload binary")
    return MM.image_phash(assets)


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    spark = get_spark(app_name="ab_multimodal")
    docs = load_tables(spark, SF).documents.select("doc_id")
    old_df = old_gen_hash(docs)
    new_df = new_gen_hash(docs, spark, SF)
    # identity check first (also warms both paths)
    a = {(r["asset_id"], r["phash"]) for r in old_df.collect()}
    b = {(r["asset_id"], r["phash"]) for r in new_df.collect()}
    print(f"rows old={len(a)} new={len(b)} identical={a == b}", flush=True)
    assert a == b, "HASH MISMATCH - new path is NOT bit-identical"
    olds, news = [], []
    for i in range(ROUNDS):
        olds.append(time_noop(old_df))
        news.append(time_noop(new_df))
        print(f"round {i}: old={olds[-1]:.3f} new={news[-1]:.3f}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"MEDIAN old={med(olds):.3f} new={med(news):.3f} "
          f"speedup={med(olds) / med(news):.2f}x", flush=True)


if __name__ == "__main__":
    main()
