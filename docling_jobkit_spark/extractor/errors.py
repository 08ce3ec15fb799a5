"""Typed failure taxonomy.

Re-expresses the reference's public error classification
(``docling_jobkit/datamodel/public_errors.py:90-175`` — categories
POLICY / TIMEOUT / SOURCE_UNAVAILABLE / TARGET_UNAVAILABLE / CAPACITY /
INTERNAL with a ``retryable`` flag and a ``phase``) as a plain dataclass
used for the ``error`` struct column. Data-level failures become rows,
never Spark task failures (reference precedent:
``orchestrators/ray/serve_deployment.py:693-747`` retry wrapper
short-circuiting client-actionable errors into structured results).
"""

from __future__ import annotations

from dataclasses import dataclass


CATEGORY_POLICY = "POLICY"
CATEGORY_SOURCE_UNAVAILABLE = "SOURCE_UNAVAILABLE"
CATEGORY_TARGET_UNAVAILABLE = "TARGET_UNAVAILABLE"
CATEGORY_CAPACITY = "CAPACITY"
CATEGORY_INTERNAL = "INTERNAL"
CATEGORY_TIMEOUT = "TIMEOUT"

PHASE_ADMISSION = "admission"
PHASE_DECODE = "decode"
PHASE_EXTRACT = "extract"
PHASE_SINK = "sink"


@dataclass(frozen=True)
class FailureInfo:
    category: str
    message: str
    retryable: bool
    phase: str

    def as_dict(self) -> dict:
        return {
            "category": self.category,
            "message": self.message,
            "retryable": self.retryable,
            "phase": self.phase,
        }


def classify_failure(exc: BaseException, phase: str = PHASE_EXTRACT) -> FailureInfo:
    """Map an exception to the public failure taxonomy.

    Mirrors the decision table of the reference's
    ``classify_public_task_failure`` (memory pressure → CAPACITY &
    retryable; value/size violations → POLICY & non-retryable; everything
    else → INTERNAL & non-retryable).
    """
    if isinstance(exc, MemoryError):
        return FailureInfo(CATEGORY_CAPACITY, "out of memory", True, phase)
    if isinstance(exc, TimeoutError):
        return FailureInfo(CATEGORY_TIMEOUT, str(exc) or "timeout", True, phase)
    if phase == PHASE_SINK and (
        isinstance(exc, OSError) or "Py4J" in exc.__class__.__name__
    ):
        # write-side I/O failure (fs down, connection refused, quota):
        # TARGET_UNAVAILABLE and retryable, per the reference taxonomy
        # (public_errors.py:101-175 maps sink errors to target category).
        # JVM-side write errors reach Python wrapped as Py4JJavaError.
        return FailureInfo(
            CATEGORY_TARGET_UNAVAILABLE, str(exc) or exc.__class__.__name__, True, phase
        )
    if isinstance(exc, (ValueError, UnicodeError)):
        return FailureInfo(CATEGORY_POLICY, str(exc) or exc.__class__.__name__, False, phase)
    return FailureInfo(
        CATEGORY_INTERNAL, f"{exc.__class__.__name__}: {exc}", False, phase
    )
