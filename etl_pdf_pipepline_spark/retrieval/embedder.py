"""Pluggable embedding providers (reference Q8).

The reference batches texts 100-at-a-time to the OpenAI embeddings API
(/root/reference/src/transform/embedder.py:38-121, batch size
src/config.py:86). The external API is a side effect, not a semantic, so
the engine ships:

- `HashEmbedder` (default): deterministic, network-free, test-oracle-able.
  embedding[i] = signed hash of (seed=i, token) summed over tokens, unit-
  normalized (FIXTURES.md §6 convention).
- `embed_dataframe`: the Spark-shaped batching — `mapInPandas` so each
  Arrow batch becomes one provider call, the direct analogue of the
  reference's batch loop but partition-parallel instead of sequential.

A real OpenAI-compatible provider would implement `embed_batch` with an
HTTP client; it is deliberately not imported here (no network deps).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType


class Embedder(Protocol):
    dim: int

    def embed_batch(self, texts: list[str]) -> list[list[float]]: ...


class HashEmbedder:
    """Deterministic hash-projection embedder, dim 16 by default."""

    def __init__(self, dim: int = 16, seed: int = 42):
        self.dim = dim
        self.seed = seed

    def _token_value(self, token: str, i: int) -> float:
        h = hashlib.md5(f"{self.seed}:{i}:{token}".encode()).hexdigest()
        # top 8 hex chars → int, centered to a signed unit-ish value
        v = int(h[:8], 16)
        return (v / 0x7FFFFFFF) - 1.0

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            toks = sorted({tok for tok in (t or "").lower().split() if tok})
            vec = [
                sum(self._token_value(tok, i) for tok in toks) if toks else 0.0
                for i in range(self.dim)
            ]
            n = math.sqrt(sum(x * x for x in vec))
            out.append([float(x / n) if n > 0 else 0.0 for x in vec])
        return out


def embed_dataframe(
    df: DataFrame,
    text_col: str,
    embedder: Embedder | None = None,
    out_col: str = "embedding",
    batch_size: int = 100,
) -> DataFrame:
    """Append an embedding column via Arrow-batched mapInPandas.

    Each partition streams pandas batches; each provider call sees at most
    `batch_size` texts (the reference's API batching, src/config.py:86),
    but partitions embed in parallel across the cluster.
    """
    emb = embedder or HashEmbedder()
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs: list[list[float]] = []
            texts = pdf[text_col].fillna("").tolist()
            for start in range(0, len(texts), batch_size):
                vecs.extend(emb.embed_batch(texts[start : start + batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(run, schema=schema)


def embed_query(text: str, embedder: Embedder | None = None) -> list[float]:
    """Driver-side single-query embedding (reference Q7,
    /root/reference/src/retrieve/hybrid_retriever.py:132)."""
    emb = embedder or HashEmbedder()
    return emb.embed_batch([text])[0]
