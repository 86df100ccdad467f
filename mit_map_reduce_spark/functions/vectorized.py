"""Arrow-vectorized (NumPy) embedding math — the fast path beside the
Catalyst higher-order-function forms in ``functions.columns``.

The HOF fold (``F.aggregate`` / ``F.zip_with``) is JVM-side but
INTERPRETED per element (~100 ns/element measured locally), so a
64-dim dot product over millions of pairs dominates the embedding
operators' runtime. This pandas UDF moves the same arithmetic into
NumPy over Arrow batches: one C loop per batch instead of one
Catalyst expression-tree walk per element.

Bit-parity contract: the HOF ``dot_product`` accumulates left-to-right
in float64 (``((0+p0)+p1)+...``), and the DuckDB oracles reproduce that
exact order. NumPy's ``sum``/``dot`` use pairwise/SIMD accumulation,
which can differ in the last ulp and flip a rounded 4-dp value across
engines — so this implementation accumulates with ``cumsum`` along the
dimension axis, which is sequential by definition: identical bit
pattern to the fold, vectorized across the batch's rows. Products are
formed in float64 from the float32 inputs, same as the fold's
per-element double cast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def dot_product_np(a: pd.Series, b: pd.Series) -> pd.Series:
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    av = np.vstack(a.to_numpy()).astype(np.float64, copy=False)
    bv = np.vstack(b.to_numpy()).astype(np.float64, copy=False)
    prod = av * bv
    # cumsum is a sequential left-to-right accumulation — bit-identical
    # to the Catalyst fold / the oracle's list_sum, unlike np.sum.
    return pd.Series(prod.cumsum(axis=1)[:, -1])


def cosine_np(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from the vectorized dot and precomputed norms.

    Norms stay on the (persisted) corpus row — computed once per vector
    by the HOF form, so only the pairwise O(n*k) dot rides the UDF.
    """
    return dot_product_np(a, b) / (norm_a * norm_b)
