"""Example: the headline FHN-on-a-torus experiment, end to end.

Reproduces the reference's runFHNmodelTorus.sh pipeline (simulate -> movie
frames -> torus VTP/PVD for ParaView) from its own shipped config, then
prints run statistics and throughput.

    python examples/fhn_torus_spiral.py [outdir]
"""

import sys

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu import config_from_ini, simulate
from crdmodel_tpu.io.trajectory import save_npz, write_reference_files
from crdmodel_tpu.utils import RunManifest, throughput
from crdmodel_tpu.viz import generate_torus_vtp, map_output_to_torus, plot_movie


def main(outdir: str = "fhn_torus_out"):
    cfg = config_from_ini("/root/reference/data/FHNmodelArgs.ini",
                          model="fhn", surface="torus")
    res = simulate(cfg)
    print(res.describe())
    print(f"throughput: {throughput(res):.3e} grid-points*steps/s")

    write_reference_files(res, outdir)
    save_npz(res, f"{outdir}/trajectory.npz")
    RunManifest.from_result(res).save(f"{outdir}/manifest.json")
    plot_movie(res, cfg, outdir)
    generate_torus_vtp(cfg, outdir)
    map_output_to_torus(res, outdir)
    print(f"outputs in {outdir}/ (open FHNtimeSteps.pvd in ParaView)")


if __name__ == "__main__":
    main(*sys.argv[1:])
