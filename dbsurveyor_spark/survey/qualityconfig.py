"""Quality assessment configuration (SURVEY.md §2.C).

Mirrors the reference's quality configuration surface
(`/root/reference/dbsurveyor-core/src/quality/config.rs`):

- AnomalySensitivity Low/Medium/High → z-score thresholds 3.0/2.5/2.0
  (config.rs:27 z_score_threshold), Medium the default (config.rs:19).
- AnomalyConfig {enabled, sensitivity} (config.rs:38).
- QualityConfig {enabled, completeness_min 0.95, uniqueness_min 0.98,
  consistency_min 0.90, anomaly_detection, per-component weights 1.0}
  (config.rs:79 + Default at config.rs:108), with range validation
  (config.rs ConfigValidationError).
- Weighted quality score `(c·wc + s·ws + u·wu) / (wc+ws+wu)`, 0.0 when all
  weights are zero (analyzer.rs:171 calculate_quality_score).
- ThresholdViolation {metric, threshold, actual, severity} with severity
  Critical below 80% of threshold, Warning otherwise
  (quality/models.rs:22,34 CRITICAL_SEVERITY_RATIO).

Pure driver-side configuration — no Spark dependency; the analyzers in
`survey/quality.py` consume it and stay single-pass aggregates at any SF.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class AnomalySensitivity(str, Enum):
    """How many standard deviations from the mean marks an outlier."""

    LOW = "low"  # 3.0 σ — fewer false positives
    MEDIUM = "medium"  # 2.5 σ — balanced (reference default)
    HIGH = "high"  # 2.0 σ — more aggressive

    @property
    def z_score_threshold(self) -> float:
        return _Z_THRESHOLDS[self]


_Z_THRESHOLDS = {
    AnomalySensitivity.LOW: 3.0,
    AnomalySensitivity.MEDIUM: 2.5,
    AnomalySensitivity.HIGH: 2.0,
}


@dataclass
class AnomalyConfig:
    """Anomaly detection settings (config.rs:38 AnomalyConfig)."""

    enabled: bool = True
    sensitivity: AnomalySensitivity = AnomalySensitivity.MEDIUM


# Values below this fraction of the threshold classify as critical
# (quality/models.rs:34 CRITICAL_SEVERITY_RATIO).
CRITICAL_SEVERITY_RATIO = 0.8


def threshold_violation(metric: str, threshold: float, actual: float) -> dict:
    """ThresholdViolation-shaped dict (quality/models.rs:22,43)."""
    severity = (
        "critical" if actual < threshold * CRITICAL_SEVERITY_RATIO else "warning"
    )
    return {
        "metric": metric,
        "threshold": threshold,
        "actual": actual,
        "severity": severity,
    }


@dataclass
class QualityConfig:
    """Quality analysis thresholds and weights (config.rs:79 QualityConfig).

    Note: uniqueness_min 0.98 is strict — low-cardinality columns (status,
    category) naturally trigger violations; override per run via the CLI
    flags (config.rs:114 carries the same caveat).
    """

    enabled: bool = True
    completeness_min: float = 0.95
    uniqueness_min: float = 0.98
    consistency_min: float = 0.90
    anomaly_detection: AnomalyConfig = field(default_factory=AnomalyConfig)
    completeness_weight: float = 1.0
    consistency_weight: float = 1.0
    uniqueness_weight: float = 1.0

    def validate(self) -> None:
        """Range-check thresholds (config.rs ConfigValidationError)."""
        for name in ("completeness_min", "uniqueness_min", "consistency_min"):
            v = getattr(self, name)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"{name} must be between 0.0 and 1.0, got {v}")

    @property
    def z_score_threshold(self) -> float:
        return self.anomaly_detection.sensitivity.z_score_threshold

    def quality_score(
        self, completeness: float, consistency: float, uniqueness: float
    ) -> float:
        """Normalized weighted average (analyzer.rs:171); 0.0 if all weights
        are zero (division-by-zero guard, same as the reference)."""
        wc, ws, wu = (
            self.completeness_weight,
            self.consistency_weight,
            self.uniqueness_weight,
        )
        total = wc + ws + wu
        if total == 0.0:
            return 0.0
        return (completeness * wc + consistency * ws + uniqueness * wu) / total

    def threshold_violations(
        self, completeness: float, consistency: float, uniqueness: float
    ) -> list[dict]:
        """Violations in the reference's fixed check order
        (analyzer.rs:98-121: completeness, consistency, uniqueness)."""
        out = []
        if completeness < self.completeness_min:
            out.append(
                threshold_violation(
                    "completeness", self.completeness_min, completeness
                )
            )
        if consistency < self.consistency_min:
            out.append(
                threshold_violation("consistency", self.consistency_min, consistency)
            )
        if uniqueness < self.uniqueness_min:
            out.append(
                threshold_violation("uniqueness", self.uniqueness_min, uniqueness)
            )
        return out
