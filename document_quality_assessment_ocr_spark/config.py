"""Criteria configuration model.

Mirrors the reference's pydantic models (reference
``src/document_assessor/models.py:13-53``) as plain dataclasses — the config is
tiny driver-side state, broadcast by closure into UDFs / folded into Column
literals, never a join (SURVEY.md §2.6).

The default config below is a verbatim value-copy of the reference's shipped
``config/criteria_config.json`` (all 10 criteria ``required``) — thresholds and
order matter for verdict parity (reference ``criteria.py:205-325``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class Threshold:
    """Flat optional-float threshold bag (reference ``models.py:13-45``).

    Note the reference declares ``max_percent`` twice (text-density upper band
    and noise cap); pydantic keeps a single field. We keep a single field too:
    each criterion owns its own Threshold instance, so there is no cross-talk.
    """

    min_dpi: Optional[float] = None
    min_width: Optional[float] = None
    tolerance_dpi: Optional[float] = None
    tolerance_width: Optional[float] = None
    min: Optional[float] = None
    max: Optional[float] = None
    min_contrast: Optional[float] = None
    min_variance: Optional[float] = None
    max_deg: Optional[float] = None
    min_percent: Optional[float] = None
    max_percent: Optional[float] = None
    max_overlap: Optional[float] = None
    min_entropy: Optional[float] = None
    min_content_ratio: Optional[float] = None


# reference models.py:7-10
REQUIRED = "required"
RECOMMENDED = "recommended"
WARNING = "warning"


@dataclass
class CriteriaConfig:
    name: str
    type: str = REQUIRED
    description: str = ""
    threshold: Optional[Threshold] = None
    aggregate_mode: str = "min"


def _c(name: str, type_: str, aggregate_mode: str, **thresh) -> CriteriaConfig:
    return CriteriaConfig(
        name=name,
        type=type_,
        description=name,
        threshold=Threshold(**thresh) if thresh else None,
        aggregate_mode=aggregate_mode,
    )


def default_criteria() -> List[CriteriaConfig]:
    """Value-copy of reference ``config/criteria_config.json:1-79``."""
    return [
        _c("file_integrity", REQUIRED, "all_pass"),
        _c("skew", REQUIRED, "max", max_deg=5),
        _c("text_density", REQUIRED, "avg", min_percent=1, max_percent=80),
        _c(
            "resolution",
            REQUIRED,
            "avg",
            min_dpi=72,
            min_width=800,
            tolerance_dpi=5,
            tolerance_width=50,
        ),
        _c("brightness", REQUIRED, "avg", min=50, max=250, min_contrast=20),
        _c("blur", REQUIRED, "min", min_variance=50),
        _c("noise", REQUIRED, "max", max_percent=15),
        _c("watermark", REQUIRED, "max", max_overlap=10),
        _c("compression", REQUIRED, "min", min_entropy=0.2),
        _c("missing_pages", REQUIRED, "min", min_content_ratio=1),
    ]


def tiered_criteria() -> List[CriteriaConfig]:
    """Variant config with required/recommended/warning tiers.

    Exercises all three verdict-fold routing paths (reference
    ``criteria.py:316-325``; tiers described in reference ``CRITERIA.md:46-62``
    and ``BA_Report.md:48-50``).
    """
    out = default_criteria()
    tiers = {
        "watermark": WARNING,
        "compression": RECOMMENDED,
        "brightness": RECOMMENDED,
        "noise": WARNING,
    }
    for c in out:
        c.type = tiers.get(c.name, REQUIRED)
    return out


def load_criteria_config(path: str) -> List[CriteriaConfig]:
    """JSON file with top-level key ``criteria`` → list (reference
    ``criteria.py:18-25``)."""
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)["criteria"]
    out = []
    for c in data:
        t = c.get("threshold")
        out.append(
            CriteriaConfig(
                name=c["name"],
                type=c.get("type", REQUIRED),
                description=c.get("description", ""),
                threshold=Threshold(**t) if t else None,
                aggregate_mode=c.get("aggregate_mode", "min"),
            )
        )
    return out
