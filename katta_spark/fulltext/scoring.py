"""Function-score decay builders — ES ``function_score`` decay
functions (gauss / exp / linear) as Column expressions over stored
fields, composable with :meth:`PhysicalIndex.topk_boosted` (the
reference reaches the same behavior through Solr boost function
queries, SolrQuery pass-through `LuceneClient.java:255-276`).

The Spark Column and the DuckDB oracle fragment are generated from
ONE constant-derivation (:func:`_decay_params`), so the two engines
evaluate the same formula — the ES reference semantics:

    d      = max(0, |v - origin| - offset)
    gauss  = exp(-d^2 / (2*sigma^2)),  sigma^2 = -scale^2 / (2*ln(decay))
    exp    = exp(lambda * d),          lambda  = ln(decay) / scale
    linear = max(0, (s - d) / s),      s       = scale / (1 - decay)

so that the score at distance ``scale`` (past ``offset``) is exactly
``decay``.  Pure JVM column algebra — zero Python, zero shuffle.
"""

from __future__ import annotations

import math


def _decay_params(kind: str, origin: float, scale: float,
                  offset: float, decay: float) -> dict:
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    if scale <= 0:
        raise ValueError("scale must be positive")
    p = {"origin": float(origin), "offset": float(offset)}
    if kind == "gauss":
        p["sigma2"] = -(float(scale) ** 2) / (2.0 * math.log(decay))
    elif kind == "exp":
        p["lam"] = math.log(decay) / float(scale)
    elif kind == "linear":
        p["s"] = float(scale) / (1.0 - decay)
    else:
        raise ValueError(f"unknown decay kind {kind!r}")
    return p


def decay_col(kind: str, field: str, origin: float, scale: float,
              offset: float = 0.0, decay: float = 0.5):
    """Spark Column for an ES decay function over a numeric stored
    field.  ``kind`` in {gauss, exp, linear}."""
    from pyspark.sql import functions as F

    p = _decay_params(kind, origin, scale, offset, decay)
    v = F.col(field).cast("double")
    d = F.greatest(
        F.lit(0.0), F.abs(v - F.lit(p["origin"])) - F.lit(p["offset"])
    )
    if kind == "gauss":
        return F.exp(-(d * d) / F.lit(2.0 * p["sigma2"]))
    if kind == "exp":
        return F.exp(F.lit(p["lam"]) * d)
    return F.greatest(F.lit(0.0), (F.lit(p["s"]) - d) / F.lit(p["s"]))


def decay_sql(kind: str, field: str, origin: float, scale: float,
              offset: float = 0.0, decay: float = 0.5) -> str:
    """DuckDB fragment for the SAME decay (documents row alias
    ``d``) — feed to ``boosted_topk_sql``."""
    p = _decay_params(kind, origin, scale, offset, decay)
    d_sql = (
        f"greatest(0.0, abs(CAST(d.{field} AS DOUBLE) - {p['origin']!r})"
        f" - {p['offset']!r})"
    )
    if kind == "gauss":
        return f"exp(-({d_sql} * {d_sql}) / {2.0 * p['sigma2']!r})"
    if kind == "exp":
        return f"exp({p['lam']!r} * {d_sql})"
    return f"greatest(0.0, ({p['s']!r} - {d_sql}) / {p['s']!r})"
