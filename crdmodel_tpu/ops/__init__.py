from crdmodel_tpu.ops.stencil import flat_laplacian, torus_laplacian

__all__ = ["flat_laplacian", "torus_laplacian"]
