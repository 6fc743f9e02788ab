"""Framework-wide constants, mirroring the reference's compile-time values
(``CudaTracer/CudaTracer.h:6-7``, ``CudaTracer/CudaUtils.h:7``,
``CudaTracer/CudaTracer.h:39``) — but runtime-configurable where the
reference hardcoded them."""

RAY_BUMP_EPSILON = 1e-4          # CudaTracer.h:6
GAMMA_CORRECTION = 1.0 / 2.2     # CudaTracer.h:7
INV_PI = 0.31830988618           # CudaTracer.h:4 (INVERSE_PI)

DEFAULT_MAX_BOUNCES = 15         # CudaTracer.h:39 (maxIterations)
DEFAULT_DIM = 512                # CudaUtils.h:7 (DIM)
LIVE_RAY_CUTOFF = 128            # CudaTracer.cu:622 early-exit threshold

# Bidirectional-MIS ratio ceiling (round 5). The power-heuristic weights
# square density ratios that legitimately reach ~1e20 when the competing
# technique's density underflows; the square then overflows to inf. The
# FORWARD value is fine (1/(1+inf) = 0) but reverse-mode AD of 1/(1+r^2)
# multiplies inf by a zero cotangent -> NaN gradients for the whole image
# (tests/test_bidir.py FD test). Clamping each ratio here keeps r^2 finite
# in f32 (1e36 < 3.4e38); weights change by at most ~1e-36 — invisible —
# and the saturated clamp has the correct (zero) derivative.
MIS_RATIO_CLAMP = 1e18
