"""Python-side reference for the engine's rounding contract.

Every quantized engine output goes through Spark's ``F.round``, which is
java.math.BigDecimal ROUND_HALF_UP on the shortest-decimal repr of the
double (ties round AWAY from zero). Python's builtin ``round`` is
banker's rounding (ties to even), so a test reference written as
``engine_value == round(python_float, 6)`` silently diverges at exact
.5 boundaries — Hypothesis found a real one in round 10
(AUC 0.6015625 → engine 0.601563, builtin round 0.601562; r10 VERDICT
"What's wrong" #1). All ``== round(...)`` comparisons against
engine-rounded values must use ``half_up`` instead.

``Decimal(repr(x))`` sees Python's shortest round-trip decimal repr;
``BigDecimal.valueOf(double)`` sees ``Double.toString``'s repr, which is
only guaranteed shortest on JDK 19+ (JDK-4511638). On older JVMs (this
sandbox runs Java 17) a rare non-shortest repr could in principle flip a
HALF_UP tie digit, so the bit-for-bit claim is pinned *empirically*, not
axiomatically: ``test_half_up_reference_matches_spark_round_bitwise``
in test_properties.py property-checks ``half_up`` against ``F.round``
on this exact JVM and is the authoritative guarantee.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def half_up(x: float, ndigits: int = 6):
    """Round ``x`` to ``ndigits`` decimals with ties away from zero —
    the exact semantics of Spark's ``F.round(col, ndigits)``. Returns
    float for ndigits > 0, int for ndigits == 0 (matching the engine's
    ``F.round(...).cast("long")`` micro-quantization sites)."""
    q = Decimal(1).scaleb(-ndigits)
    d = Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP)
    return int(d) if ndigits == 0 else float(d)
