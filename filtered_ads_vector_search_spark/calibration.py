"""Host-calibration probes: separate HOST drift from CODE drift in bench runs.

Round 8 showed the host running 2-3x slow for hours on memory-bandwidth-heavy
work while compute-bound rows stayed normal (BENCH_DRIFT.md round-8 A/B), which
contaminated the committed 5M nc=256 rows and cost a full pristine-checkout A/B
to diagnose. Three fixed constant-work probes make every bench artifact
self-certifying instead:

  * ``dgemm_2048_s`` — compute-bound: 17.2 GFLOP float64 DGEMM (seeded 2048^3).
  * ``triad_256mb_s`` — bandwidth-bound: ``np.add(x, y).sum()`` over 2x256 MB
    (~1 GB of memory traffic per rep). THE discriminator for the round-8 noise
    class.
  * ``spark_job_floor_s`` — Spark scheduling floor: ``spark.range(1M).count()``
    (only when a session is passed).

Normal bands for this host are documented in BENCH_DRIFT.md (round-9 section):
dgemm 0.05-0.13 s, triad 0.12-0.16 s. A run whose probes sit far outside them
(triad >= 0.25, dgemm >= 0.2) was measured on a sick host — discount its
timings, not the code. Probes are emitted under ``extras.calibration`` only and
NEVER mixed into graded query timings.
"""

from __future__ import annotations

import time


def _t(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def host_calibration(spark=None) -> dict[str, float]:
    """Run the fixed probes; min-of-N so one scheduler hiccup can't inflate.

    ``spark`` is optional: scale benches call this BEFORE building indexes
    (pre-flight, no session cost attribution), bench.py calls it with the
    live session to also record the job-scheduling floor.
    """
    import numpy as np

    rng = np.random.RandomState(42)
    A = rng.standard_normal((2048, 2048))
    B = rng.standard_normal((2048, 2048))
    (A @ B).sum()  # BLAS thread-pool warmup outside the timed reps
    dgemm = min(_t(lambda: (A @ B).sum()) for _ in range(3))
    x = rng.standard_normal(32 * 1024 * 1024)  # 256 MB
    y = rng.standard_normal(32 * 1024 * 1024)
    triad = min(_t(lambda: np.add(x, y).sum()) for _ in range(5))
    out = {
        "dgemm_2048_s": round(dgemm, 4),
        "triad_256mb_s": round(triad, 4),
    }
    if spark is not None:
        sched = min(_t(lambda: spark.range(1_000_000).count()) for _ in range(3))
        out["spark_job_floor_s"] = round(sched, 4)
    return out


def assert_quiet_host(cal: dict[str, float]) -> list[str]:
    """Return human-readable warnings for probes outside the documented band.

    Non-fatal by design: a bench on a noisy host still produces an artifact,
    but the artifact carries the evidence. Callers print the warnings next to
    the headline line.
    """
    warnings = []
    if cal.get("triad_256mb_s", 0.0) >= 0.25:
        warnings.append(
            f"triad_256mb_s={cal['triad_256mb_s']} >= 0.25: host memory "
            "bandwidth degraded (round-8 noise class) — timings suspect"
        )
    if cal.get("dgemm_2048_s", 0.0) >= 0.20:
        warnings.append(
            f"dgemm_2048_s={cal['dgemm_2048_s']} >= 0.20: host CPU contended "
            "— timings suspect"
        )
    return warnings
