"""Business constants of the analytics domain.

Semantics lifted from the reference configuration (``config/settings.py:63-94``
in the reference repo): aging buckets for overdue receivables, collection-cycle
buckets, anomaly thresholds, and the KPI analysis window. Buckets are
``(lo, hi, label)`` with ``None`` for open ends; ``lo`` is exclusive and ``hi``
inclusive, matching the reference's ``np.select`` ladders
(``src/reporte_cxc.py:402-433``).

All "today" anchors in the engine are injected ``as_of`` parameters
(reference call sites ``src/reporte_cxc.py:382``, ``src/kpis.py:29``) so every
derived metric is reproducible.
"""

from __future__ import annotations

import datetime as _dt

# Aging buckets for open (overdue) invoices — DELTA_MORA days.
RANGOS_ANTIGUEDAD: list[tuple[int | None, int | None, str]] = [
    (None, 0, "VIGENTE"),
    (0, 15, "1-15 DIAS"),
    (15, 30, "16-30 DIAS"),
    (30, 60, "31-60 DIAS"),
    (60, 90, "61-90 DIAS"),
    (90, 180, "91-180 DIAS"),
    (180, 365, "181-365 DIAS"),
    (365, None, "MAS DE 365 DIAS"),
]

# Collection-cycle buckets for paid invoices — DELTA_RECAUDO days
# (payment date − due date; negative = early).
RANGOS_RECAUDO: list[tuple[int | None, int | None, str]] = [
    (None, 0, "ANTICIPADO"),
    (0, 15, "1-15 DIAS"),
    (15, 30, "16-30 DIAS"),
    (30, 60, "31-60 DIAS"),
    (60, 90, "61-90 DIAS"),
    (90, None, "MAS DE 90 DIAS"),
]

# Anomaly detection thresholds (z-score based audits).
ANOMALIAS = {
    "Z_SCORE_UMBRAL": 3.0,
    "DIAS_MORA_CRITICO": 90,
    "MIN_OBSERVACIONES": 3,  # z-scores need n>=3 and std>0
}

# Rolling KPI window in days (DSO / CEI / delinquency are computed over it).
KPI_PERIODO_DIAS = 90

# ABC concentration ladder over cumulative % of balance (Pareto).
ABC_UMBRAL_A = 80.0
ABC_UMBRAL_B = 95.0

# Credit-limit alert ladder over utilization = saldo / limite.
CREDITO_UMBRAL_CRITICO = 0.90
CREDITO_UMBRAL_ALTO = 0.70

# Messy boolean domain accepted as "cancelled" after upper(trim(cast as string)).
CANCELADO_ACEPTADO = ("S", "SI", "1", "TRUE")

# Deterministic "today" used by tests and the oracle harness. The synthetic
# testdata spans 2024; anchoring just after keeps every aging bucket populated.
DEFAULT_AS_OF = _dt.date(2025, 1, 1)
