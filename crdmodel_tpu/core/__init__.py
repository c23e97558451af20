from crdmodel_tpu.core.grid import Grid, FlatGeometry, TorusGeometry, make_grid
from crdmodel_tpu.core.problem import Problem, build_problem

__all__ = ["Grid", "FlatGeometry", "TorusGeometry", "make_grid", "Problem", "build_problem"]
