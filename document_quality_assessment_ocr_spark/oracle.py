"""Pure-Python oracle: reference-semantics evaluation of a spans corpus.

Re-implements the reference's per-document control flow
(``src/document_assessor/criteria.py:172-334`` + dedup/bypass from
``evaluator.py:12-57``) as a straight Python loop over the fixture corpus,
calling the SAME numpy kernels as the engine. Tests compare the Spark
pipeline's output to this, byte-identically (BASELINE.json invariant:
span-sequence equality ``(kind, text, media_ref, order)``).

Target-model decisions (documented here; the engine mirrors them exactly):
  * "pages" of a document = its media spans in offset order; docs with zero
    spans are rejected with the reference's no-images message
    (``criteria.py:198-199``); docs with spans but no media pass all image
    criteria vacuously (the reference can never reach the criteria loop with
    an empty page list, so this is the faithful extension).
  * missing or undecodable payloads reject the document with the reference's
    critical-error wrapper (``criteria.py:332-334``), first failing page in
    offset order wins; surviving-spans output is empty for such docs.
  * span gating (north_star): text spans pass the text_density band; media
    spans pass the blur/skew/noise thresholds span-level. Gating is
    independent of the document verdict; error/empty docs emit no spans;
    skip_checks docs emit all spans (``evaluator.py:20-21`` bypass analog).
"""

from __future__ import annotations

from typing import Optional

from . import kernels, png
from .config import (
    RECOMMENDED,
    REQUIRED,
    WARNING,
    CriteriaConfig,
    Threshold,
    default_criteria,
)

NO_IMAGES_MSG = "No images could be extracted from the document."
WS = set(" \t\n\r\f\x0b")


def text_density(text: Optional[str]) -> float:
    """Token-advance ink coverage: 100·ink/(len + n_tokens) — mirrors
    functions/text.text_density (see its docstring for the calibration)."""
    t = text or ""
    if not t:
        return 0.0
    ink = sum(1 for ch in t if ch not in WS)
    n_tokens = sum(1 for tok in _ws_split(t) if tok)
    return 100.0 * ink / max(len(t) + n_tokens, 1)


def _ws_split(t: str) -> list[str]:
    """Split on runs of the pinned ASCII whitespace class (same class as the
    engine's regex)."""
    out, cur = [], []
    for ch in t.strip(" \t\n\r\f\x0b"):
        if ch in WS:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _get(criteria: list[CriteriaConfig], name: str) -> Optional[CriteriaConfig]:
    return next((c for c in criteria if c.name == name), None)


def _fmt(x: float) -> str:
    """Two-decimal formatting matching Spark's ``format_string('%.2f', …)``.

    Java's Formatter rounds the double's SHORTEST decimal representation
    HALF_UP, while Python's f-string rounds the exact binary value half-even
    — they disagree on values like 0.125 ('0.13' vs '0.12'; verified
    empirically against Spark). Decimal(repr(x)) + ROUND_HALF_UP reproduces
    the Java behavior for every double."""
    from decimal import ROUND_HALF_UP, Decimal

    return str(Decimal(repr(float(x))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def score_payloads(payloads: dict) -> dict:
    """Score each distinct payload ONCE (payload → scores is pure; the engine
    does the same by scoring the payload table and joining scores to spans,
    so PNG bytes never travel with span rows). Returns
    ref → {scores, dpi, est, error}."""
    out = {}
    for ref, p in payloads.items():
        try:
            arr, _ = png.decode_gray(bytes(p["png"]))
            out[ref] = {
                "scores": kernels.score_page(arr),
                "dpi": float(p["dpi"]),
                "est": kernels.estimate_dpi(arr),
                "error": None,
            }
        except Exception as e:
            out[ref] = {"scores": None, "dpi": float(p["dpi"]), "est": 0.0, "error": str(e)}
    return out


def evaluate_document(
    spans: list[dict],
    scored: dict,
    criteria: list[CriteriaConfig],
    skip_checks: bool = False,
    max_media_spans: Optional[int] = None,
) -> dict:
    """``max_media_spans`` is the span-model analog of the reference's page
    budget (≤3 PDF pages / ≤20 TIFF frames, ``pdf_handler.py:65``,
    ``tiff_handler.py:15``): only the first K media spans (offset order)
    contribute to the DOCUMENT verdict, exactly as the reference scores only
    the rendered page subset. Span-level gating still sees every span."""
    """One document → dict(accepted, reasons, warnings, spans) where spans is
    the surviving ordered ``(kind, text, media_ref, order)`` list."""
    # total order matching the engine's sort_array over (offset, kind, text,
    # media_ref) structs — ties on offset (undefined by the input contract)
    # still resolve identically on both sides. Spark's struct ordering puts a
    # NULL field BEFORE every string (including ''), so the key carries an
    # is-not-None flag ahead of each nullable field.
    ordered = sorted(
        spans,
        key=lambda s: (
            s["offset"],
            s["kind"],
            s["text"] is not None,
            s["text"] or "",
            s["media_ref"] is not None,
            s["media_ref"] or "",
        ),
    )

    def emit(survive_fn):
        out, k = [], 0
        for s in ordered:
            if survive_fn(s):
                out.append(
                    {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "order": k}
                )
                k += 1
        return out

    if skip_checks:  # P1 bypass: reference evaluator.py:20-21
        return {"accepted": True, "reasons": [], "warnings": [], "spans": emit(lambda s: True)}
    if not spans:  # P2: reference criteria.py:198-199
        return {"accepted": False, "reasons": [NO_IMAGES_MSG], "warnings": [], "spans": []}

    # media pages in offset order (only the first ``max_media_spans`` are
    # document pages — the reference's page budget); the first failing page
    # (missing payload or decode error) rejects the whole document
    media = [s for s in ordered if s["kind"] == "media"]
    capped = media if max_media_spans is None else media[:max_media_spans]
    pages = []
    for s in capped:
        p = scored.get(s["media_ref"])
        # `or ''`: NULL media_ref renders as the empty string in the message,
        # matching the engine's coalesce (pipeline err_span)
        err = (
            f"missing media payload {s['media_ref'] or ''}" if p is None else p["error"]
        )
        if err is not None:
            return {
                "accepted": False,
                "reasons": [f"Critical error during evaluation: {err}"],
                "warnings": [],
                "spans": [],
            }
        pages.append(p)

    # --- document-level verdict: criteria loop in config order
    # (reference criteria.py:205-325); vacuous when no media pages
    is_accepted, reasons, warnings = True, [], []
    if pages:
        content_ratios = [p["scores"]["content_ratio"] for p in pages]
        for c in criteria:
            thresh = c.threshold or Threshold()
            pass_check, reason = True, ""
            name = c.name
            if name == "file_integrity":
                pass
            elif name == "resolution":
                td = _get(criteria, "text_density")
                min_content = (
                    td.threshold.min_percent if td and td.threshold else 1.0
                )
                if kernels.aggregate(content_ratios, "avg") < min_content:
                    continue  # blank-page skip, criteria.py:226-227
                dpis = [float(p["dpi"]) for p in pages]
                agg_dpi = kernels.aggregate(dpis, "min")
                if agg_dpi < thresh.min_dpi:
                    est = pages[0]["est"]  # K8 fallback, page one only
                    if est < thresh.min_dpi:
                        pass_check = False
                        reason = (
                            f"Resolution too low (metadata_dpi: {_fmt(agg_dpi)}, "
                            f"estimated_dpi: {_fmt(est)})"
                        )
            elif name == "brightness":
                vals = [p["scores"]["brightness"] for p in pages]
                if not (thresh.min <= kernels.aggregate(vals, "avg") <= thresh.max):
                    pass_check = False
                    reason = "Brightness out of range"
            elif name == "blur":
                vals = [p["scores"]["lap_var"] for p in pages]
                agg = kernels.aggregate(vals, "min")
                if agg < thresh.min_variance:
                    pass_check = False
                    reason = f"Image too blurry (variance: {_fmt(agg)})"
            elif name == "skew":
                vals = [abs(p["scores"]["skew_deg"]) for p in pages]
                if kernels.aggregate(vals, "max") > thresh.max_deg:
                    pass_check = False
                    reason = "Skew angle too large"
            elif name == "watermark":
                vals = [p["scores"]["watermark"] for p in pages]
                agg = kernels.aggregate(vals, "max")
                if agg > thresh.max_overlap:
                    pass_check = False
                    reason = f"Watermark interference too high (FFT score: {_fmt(agg)})"
            elif name == "text_density":
                agg = kernels.aggregate(content_ratios, c.aggregate_mode)
                if not (thresh.min_percent <= agg <= thresh.max_percent):
                    pass_check = False
                    reason = f"Text density out of range ({_fmt(agg)}%)"
            elif name == "noise":
                vals = [p["scores"]["noise_pct"] for p in pages]
                agg = kernels.aggregate(vals, "max")
                if agg > thresh.max_percent:
                    pass_check = False
                    reason = f"Noise level too high (max: {_fmt(agg)}%)"
            elif name == "compression":
                vals = [p["scores"]["entropy"] for p in pages]
                agg = kernels.aggregate(vals, "min")
                if agg < thresh.min_entropy:
                    pass_check = False
                    reason = f"Compression artifact detected (min_entropy: {_fmt(agg)})"
            elif name == "missing_pages":
                agg = kernels.aggregate(content_ratios, "min")
                if agg < thresh.min_content_ratio:
                    pass_check = False
                    reason = f"Page may be missing or blank (content ratio: {_fmt(agg)}%)"

            if not pass_check:  # verdict fold, criteria.py:316-325
                if c.type == REQUIRED:
                    is_accepted = False
                    reasons.append(reason)
                    break
                elif c.type == RECOMMENDED:
                    reasons.append(reason)
                elif c.type == WARNING:
                    warnings.append(reason)

    # --- span gating (north_star): independent of verdict
    td = _get(criteria, "text_density")
    t_min = td.threshold.min_percent if td and td.threshold else 1.0
    t_max = td.threshold.max_percent if td and td.threshold else 80.0
    blur_c = _get(criteria, "blur")
    min_var = blur_c.threshold.min_variance if blur_c and blur_c.threshold else None
    skew_c = _get(criteria, "skew")
    max_deg = skew_c.threshold.max_deg if skew_c and skew_c.threshold else None
    noise_c = _get(criteria, "noise")
    max_noise = noise_c.threshold.max_percent if noise_c and noise_c.threshold else None

    def survives(s: dict) -> bool:
        if s["kind"] == "text":
            d = text_density(s["text"])
            return t_min <= d <= t_max
        p = scored.get(s["media_ref"])
        if p is None or p["error"] is not None:
            return False  # unscorable media span never survives gating
        sc = p["scores"]
        if min_var is not None and sc["lap_var"] < min_var:
            return False
        if max_deg is not None and abs(sc["skew_deg"]) > max_deg:
            return False
        if max_noise is not None and sc["noise_pct"] > max_noise:
            return False
        return True

    return {
        "accepted": is_accepted,
        "reasons": reasons,
        "warnings": warnings,
        "spans": emit(survives),
    }


def evaluate_corpus(
    rows: list[dict],
    payloads: dict,
    criteria: Optional[list[CriteriaConfig]] = None,
    max_media_spans: Optional[int] = None,
) -> dict[str, dict]:
    """Whole corpus → {doc_id: result}. Duplicate doc_ids collapse last-wins
    by ingest_seq (reference dedup, ``evaluator.py:55-57``)."""
    criteria = criteria or default_criteria()
    latest: dict[str, dict] = {}
    for r in sorted(rows, key=lambda r: r["ingest_seq"]):
        latest[r["doc_id"]] = r
    scored = score_payloads(payloads)
    return {
        doc_id: evaluate_document(
            r["spans"],
            scored,
            criteria,
            skip_checks=r.get("skip_checks", False),
            max_media_spans=max_media_spans,
        )
        for doc_id, r in latest.items()
    }
