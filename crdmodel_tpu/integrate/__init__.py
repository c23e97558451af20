from crdmodel_tpu.integrate.erk import (
    Tableau, TABLEAUS, integrate_to_outputs, wrms_norm, SolveStats,
)

__all__ = ["Tableau", "TABLEAUS", "integrate_to_outputs", "wrms_norm", "SolveStats"]
