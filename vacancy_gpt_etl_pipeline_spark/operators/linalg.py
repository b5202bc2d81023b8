"""Distributed dense linear algebra over embedding columns — the
Gram/covariance → driver-side eigen → broadcast projection recipe that
backs PCA, whitening and low-rank compression of training-data
embedding stores.

Scale shape (the classic tall-skinny decomposition): N vectors × d dims
with d small (64 here, ≤ a few thousand in practice) and N huge. The
ONLY data-sized pass is the Gram accumulation — one Arrow
``mapInPandas`` over the vectors emitting d(d+1)/2 partial-sum rows PER
BATCH (a numpy outer product, BLAS-backed), merged by a single groupBy
whose input is O(batches · d²) — independent of N. The d×d eigenproblem
is driver-side numpy (``eigh`` on a 64×64 symmetric matrix is
microseconds — the same driver-scale step every distributed PCA does,
e.g. Spark MLlib's RowMatrix.computePrincipalComponents). Projection
broadcasts the d×k component matrix back and is one more Arrow matmul
pass. Nothing here ever shuffles a vector.

Determinism: the oracle-facing Gram sums are computed over QUANTIZED
values (``floor(double(x) · scale)`` as int64) so every product and sum
is exact integer arithmetic — bit-identical across engines and across
partitionings (float sums would be addition-order-dependent). The
float64 eigen path keeps full precision internally; its guarantees are
asserted by property tests (orthonormality, diagonalization, variance
ordering), not by cross-engine hashes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pca_model", "pca_project", "quantized_gram"]

GRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("gram", T.LongType(), False),
        T.StructField("sum_i", T.LongType(), False),
        T.StructField("sum_j", T.LongType(), False),
        T.StructField("n_vectors", T.LongType(), False),
    ]
)


def quantized_gram(
    df: DataFrame, vec_col: str = "embedding", scale: int = 1000
) -> DataFrame:
    """Upper-triangle second-moment (Gram) matrix of the quantized
    vectors: one row per (i ≤ j) with ``gram = Σ q_i·q_j``, the per-dim
    sums and the vector count — everything centered covariance needs
    (``cov = (gram − sum_i·sum_j/n) / (n−1)`` after de-quantization),
    in exact int64 arithmetic.

    ``q = floor(float64(x) · scale)`` — the same closed form an ANSI
    oracle can evaluate, which is what makes this frame value-hashable
    across engines. One mapInPandas pass; each Arrow batch contributes
    d(d+1)/2 partial rows via a BLAS outer product, so the groupBy
    merges O(batches · d²) rows regardless of N. 1-based dims (matches
    SQL array subscripts)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            m = np.floor(
                np.stack(vecs.to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            g = m.T @ m  # d×d int64 — exact (values far below 2^63)
            s = m.sum(axis=0)
            d = m.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype(np.int32),
                    "j": (ju + 1).astype(np.int32),
                    "gram": g[iu, ju],
                    "sum_i": s[iu],
                    "sum_j": s[ju],
                    "n_vectors": np.full(len(iu), len(m), dtype=np.int64),
                }
            )

    partials = df.select(vec_col).mapInPandas(run, GRAM_SCHEMA)
    return partials.groupBy("i", "j").agg(
        F.sum("gram").alias("gram"),
        F.sum("sum_i").alias("sum_i"),
        F.sum("sum_j").alias("sum_j"),
        F.sum("n_vectors").alias("n_vectors"),
    )


def pca_model(
    gram: DataFrame, k: int, scale: int = 1000
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components d×k, eigenvalues k, mean d) from a
    :func:`quantized_gram` frame — the driver-side step of distributed
    PCA. The collected frame is d(d+1)/2 rows (2,080 for d=64):
    metadata-sized, like AQE stats, NOT data. De-quantizes, forms the
    centered sample covariance, and takes the top-k eigenpairs of the
    symmetric matrix (numpy ``eigh``). Columns of ``components`` are
    orthonormal; eigenvalues descend."""
    rows = gram.collect()
    if not rows:
        raise ValueError(
            "gram frame is empty — quantized_gram over zero vectors has "
            "no covariance to decompose; check the input frame is "
            "non-empty before fitting"
        )
    d = max(r["j"] for r in rows)
    n = rows[0]["n_vectors"]
    g = np.zeros((d, d))
    s = np.zeros(d)
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        g[i, j] = g[j, i] = r["gram"]
        s[i], s[j] = r["sum_i"], r["sum_j"]
    g /= float(scale) ** 2
    s /= float(scale)
    mean = s / n
    cov = (g - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return evecs[:, order], evals[order], mean


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the PCA basis: ``(x − mean) @ W`` as
    one Arrow matmul pass with the d×k component matrix broadcast by
    closure capture (kilobytes). Output schema = input columns with
    ``vec_col`` replaced by the k-dim ``out_col``."""
    comp = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    out_fields = [
        f for f in df.schema.fields if f.name != vec_col
    ] + [T.StructField(out_col, T.ArrayType(T.DoubleType()), True)]
    schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = (m - mu) @ comp
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(proj)
            yield out

    return df.mapInPandas(run, schema)
