"""Minimal VTK XML PolyData (.vtp) + ParaView collection (.pvd) writers.

Dependency-free replacement for the reference's vtkXMLPolyDataWriter + lxml
pvd generation (util/FHNmodel/MapOutputToTorus.py:193-218, util/GenTorus.py:54-59):
this image has no `vtk` module, and the subset of the format these tools need
— points, triangle connectivity, named per-cell double arrays, ascii —
is a few hundred bytes of XML scaffolding. Files open in ParaView/VTK
unchanged. A tiny reader (`read_vtp`) exists for round-trip tests.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def _fmt(arr, per_line=9):
    flat = np.asarray(arr).reshape(-1)
    parts = []
    for i in range(0, len(flat), per_line):
        parts.append(" ".join(repr(float(v)) if flat.dtype.kind == "f"
                              else str(int(v)) for v in flat[i:i + per_line]))
    return "\n".join(parts)


def write_vtp(path: str, points: np.ndarray, triangles: np.ndarray,
              cell_data: dict | None = None,
              point_data: dict | None = None) -> str:
    """points: (N,3) float; triangles: (M,3) int; cell_data/point_data:
    {name: (M,)/(N,) float arrays}."""
    points = np.asarray(points, dtype=np.float64)
    triangles = np.asarray(triangles, dtype=np.int64)
    n_pts, n_cells = len(points), len(triangles)
    lines = []
    w = lines.append
    w('<?xml version="1.0"?>')
    w('<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian">')
    w('  <PolyData>')
    w(f'    <Piece NumberOfPoints="{n_pts}" NumberOfVerts="0" '
      f'NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{n_cells}">')
    w('      <Points>')
    w('        <DataArray type="Float64" NumberOfComponents="3" format="ascii">')
    w(_fmt(points))
    w('        </DataArray>')
    w('      </Points>')
    w('      <Polys>')
    w('        <DataArray type="Int64" Name="connectivity" format="ascii">')
    w(_fmt(triangles))
    w('        </DataArray>')
    w('        <DataArray type="Int64" Name="offsets" format="ascii">')
    w(_fmt(3 * (np.arange(n_cells, dtype=np.int64) + 1)))
    w('        </DataArray>')
    w('      </Polys>')
    for tag, data in (("CellData", cell_data), ("PointData", point_data)):
        if data:
            w(f'      <{tag}>')
            for name, arr in data.items():
                w(f'        <DataArray type="Float64" Name="{name}" '
                  f'format="ascii">')
                w(_fmt(np.asarray(arr, dtype=np.float64)))
                w('        </DataArray>')
            w(f'      </{tag}>')
    w('    </Piece>')
    w('  </PolyData>')
    w('</VTKFile>')
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def read_vtp(path: str):
    """Parse an ascii .vtp written by write_vtp (or similar): returns
    (points, triangles, cell_data dict)."""
    root = ET.parse(path).getroot()
    piece = root.find("./PolyData/Piece")
    pts_el = piece.find("./Points/DataArray")
    points = np.fromstring(pts_el.text, sep=" ").reshape(-1, 3)
    conn = offs = None
    for da in piece.findall("./Polys/DataArray"):
        if da.get("Name") == "connectivity":
            conn = np.fromstring(da.text, sep=" ", dtype=np.int64)
        elif da.get("Name") == "offsets":
            offs = np.fromstring(da.text, sep=" ", dtype=np.int64)
    tris = conn.reshape(-1, 3) if conn is not None else None
    cell_data = {}
    cd = piece.find("CellData")
    if cd is not None:
        for da in cd.findall("DataArray"):
            cell_data[da.get("Name")] = np.fromstring(da.text, sep=" ")
    return points, tris, cell_data


def write_pvd(path: str, timestep_files: dict) -> str:
    """ParaView collection: {time: vtp_path} -> .pvd
    (reference util/FHNmodel/MapOutputToTorus.py:202-218, format-compatible).
    Times are formatted to one decimal place like the reference."""
    lines = ["<?xml version='1.0' encoding='iso-8859-1'?>",
             "<VTKFile type=\"Collection\" version=\"0.1\" "
             "byte_order=\"LittleEndian\" compressor=\"vtkZLibDataCompressor\">",
             "  <Collection>"]
    for time in sorted(timestep_files):
        tstr = repr(float("{0:.1f}".format(time)))
        lines.append(f'    <DataSet timestep="{tstr}" group="" part="0" '
                     f'file="{timestep_files[time]}"/>')
    lines += ["  </Collection>", "</VTKFile>"]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path
