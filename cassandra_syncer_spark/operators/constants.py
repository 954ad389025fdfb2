"""Shared tuning constants used by more than one query module.

Centralized so a retune is visible to every consumer (round-11 ADVICE:
``agg_trimmed_mean_selection`` importing the median's underscore-private
bucket width made the coupling invisible).
"""

from __future__ import annotations

#: coarse-bucket width for the two-phase counting selections (round 11):
#: wide enough that the phase-1 histogram map-side-combines hard (~2,600
#: cells over the ~10⁷ centi-price domain), narrow enough that the phase-2
#: exact pass touches a ~1/2,600 row slice.  Pure implementation constant —
#: the selected order statistics are identical for ANY width.  Consumers:
#: agg_median_selection (analytics_r8b), agg_trimmed_mean_selection
#: (analytics_r8c).
SEL_BUCKET = 4096
