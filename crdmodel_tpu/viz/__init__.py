from crdmodel_tpu.viz.plots import plot_movie, render_frames, hopf_positions
from crdmodel_tpu.viz.torus_mesh import (generate_revolution_vtp,
                                         generate_torus_vtp,
                                         revolution_mesh, torus_mesh)
from crdmodel_tpu.viz.map_output import (map_output_to_surface,
                                         map_output_to_torus)
from crdmodel_tpu.viz.curvature import (
    generate_curvature_coupling_vtp, plot_curvature_profiles,
    gaussian_curvature, coupling_strength,
)
from crdmodel_tpu.viz.vtp import write_vtp, read_vtp, write_pvd
from crdmodel_tpu.viz.volume import (read_vti, save_volume_series,
                                     volume_slice, write_vti)
from crdmodel_tpu.viz.maps import (activation_times, apd_map,
                                   conduction_velocity,
                                   dominant_frequency_map,
                                   physical_spacings)

__all__ = [
    "plot_movie", "render_frames", "hopf_positions",
    "generate_torus_vtp", "torus_mesh", "map_output_to_torus",
    "map_output_to_surface", "generate_revolution_vtp", "revolution_mesh",
    "generate_curvature_coupling_vtp", "plot_curvature_profiles",
    "gaussian_curvature", "coupling_strength",
    "write_vtp", "read_vtp", "write_pvd",
    "write_vti", "read_vti", "save_volume_series", "volume_slice",
    "activation_times", "apd_map", "conduction_velocity",
    "dominant_frequency_map", "physical_spacings",
]
