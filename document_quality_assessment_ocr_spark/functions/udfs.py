"""Arrow-batched pandas UDFs for media-span scoring.

The only Python execution in the hot path. Each UDF receives whole Arrow
batches (pandas Series), loops the batch in numpy (the kernels are O(pixels),
so the per-element Python dispatch is noise), and returns a struct column —
one decode per payload feeds ALL kernels, mirroring the reference's
extract-images-once design (``criteria.py:176-197``).

Errors are data, not task failures (reference ``criteria.py:332-334``,
``evaluator.py:37-43``): decode/scoring exceptions land in the ``error``
field and flow to the verdict as a per-document critical-error rejection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .. import kernels, png

MEDIA_SCORE_SCHEMA = StructType(
    [
        StructField("content_ratio", DoubleType()),
        StructField("brightness", DoubleType()),
        StructField("lap_var", DoubleType()),
        StructField("skew_deg", DoubleType()),
        StructField("watermark", DoubleType()),
        StructField("noise_pct", DoubleType()),
        StructField("entropy", DoubleType()),
        StructField("est_dpi", DoubleType()),
        StructField("error", StringType()),
    ]
)

_SCORE_COLS = [f.name for f in MEDIA_SCORE_SCHEMA.fields]


def _score_batch(payload: pd.Series, media_ref: pd.Series) -> pd.DataFrame:
    out = {c: np.full(len(payload), np.nan, dtype=object) for c in _SCORE_COLS}
    for i, (data, ref) in enumerate(zip(payload, media_ref)):
        if data is None:
            # skip_checks bypass rows arrive with payload nulled out upstream;
            # genuinely-missing payloads get an explicit error before the UDF.
            for c in _SCORE_COLS:
                out[c][i] = None
            continue
        try:
            arr, _ = png.decode_gray(bytes(data))
            s = kernels.score_page(arr)
            for k, v in s.items():
                out[k][i] = float(v)
            # K8 computed eagerly per DISTINCT payload (this UDF runs over the
            # payload table, once per payload — not per span), trading ~15%
            # kernel time for a whole lazy-join stage (reference runs it as a
            # page-one fallback, criteria.py:242-243; results identical since
            # the function is pure)
            out["est_dpi"][i] = float(kernels.estimate_dpi(arr))
            out["error"][i] = None
        except Exception as e:  # error-as-data
            for c in _SCORE_COLS:
                out[c][i] = None
            out["error"][i] = str(e)
    return pd.DataFrame(out)


@F.pandas_udf(MEDIA_SCORE_SCHEMA)
def score_media(payload: pd.Series, media_ref: pd.Series) -> pd.DataFrame:
    """(png bytes, media_ref) → struct of all K1–K7 scores + error."""
    return _score_batch(payload, media_ref)


@F.pandas_udf(DoubleType())
def estimate_dpi_udf(payload: pd.Series) -> pd.Series:
    """K8 smart-DPI fallback — applied lazily, only to first pages of
    documents whose metadata DPI failed (reference ``criteria.py:242-243``
    runs it only as a fallback and only on page one). Null payload → null."""
    vals = []
    for data in payload:
        if data is None:
            vals.append(None)
            continue
        try:
            arr, _ = png.decode_gray(bytes(data))
            vals.append(float(kernels.estimate_dpi(arr)))
        except Exception:
            vals.append(0.0)  # reference estimate_dpi returns 0.0 on error
    return pd.Series(vals, dtype="float64")
