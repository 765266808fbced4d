"""Bundled-protein pipeline tests: assets/proteins/TSTP.pdb is the
deterministic protein-shaped asset (tools/make_test_protein.py) carrying
the irregularities real RCSB entries have — altLoc conformers, a chain
break, insertion codes, OXT, partial HELIX/SHEET headers, HETATM ligand +
waters — mirroring the reference's PDB-id example workflow
(/root/reference/index.html:541-551) in a no-egress environment."""

import os
from collections import Counter

import numpy as np
import pytest

from webgl_raytracer_tpu.models.cartoon import (
    adjust_short_segments,
    assign_secondary_structure,
    build_backbone_cartoon,
    build_residues,
    build_sheet_hbond_cylinders,
    compute_hbonds,
)
from webgl_raytracer_tpu.models.molecular import parse_pdb, split_by_hetatm

ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "assets", "proteins", "TSTP.pdb")


@pytest.fixture(scope="module")
def mol():
    with open(ASSET) as f:
        return parse_pdb(f.read())


def test_parse_counts(mol):
    assert mol.num_atoms == 437
    assert len(mol.helices) == 1           # helix 2 is NOT declared
    assert len(mol.sheets) == 2
    assert int(mol.is_het.sum()) == 10     # 6-ring ligand + 4 waters
    assert len(mol.bonds) >= 6             # CONECT ring bonds


def test_hetatm_split(mol):
    main, het = split_by_hetatm(mol)
    assert het.num_atoms == 10
    assert main.num_atoms == 427
    assert set(het.res_names) <= {"LIG", "HOH"}


def test_residue_assembly_altloc_and_icode(mol):
    res = build_residues(mol)
    assert len(res) == 85                  # 61 chain A + 24 chain B
    # altLoc preference: residues A:6 and A:31 have B (occ 0.4, first in
    # file) and A (occ 0.6) conformers; the A conformer must win.
    for seq in (6,):
        r = [x for x in res if x.chain_id == "A" and x.res_seq == seq][0]
        alt, occ = r._meta["CA"]
        assert alt == "A" and occ == pytest.approx(0.6)
    # insertion-code residue exists
    assert any(r.i_code == "A" for r in res)


def test_chain_break_detected(mol):
    res = [r for r in build_residues(mol) if r.chain_id == "A"]
    seqs = sorted(r.res_seq for r in res)
    gaps = [(a, b) for a, b in zip(seqs, seqs[1:]) if b - a > 1]
    assert gaps == [(47, 51)]
    # and the spatial gap is real (> the cartoon's 4.8 A max_gap)
    by_seq = {r.res_seq: r for r in res}
    d = np.linalg.norm(by_seq[51].atoms["CA"] - by_seq[47].atoms["CA"])
    assert d > 4.8


def test_dssp_fills_undeclared_helix(mol):
    """Helix 2 (res 52-64) has no HELIX record; DSSP must find it
    (cartoon.js:1703-1719 precedence-with-gap-fill)."""
    res = build_residues(mol)
    ss = adjust_short_segments(res, assign_secondary_structure(
        res, compute_hbonds(res)))
    by_seq = {(r.chain_id, r.res_seq): s for r, s in zip(res, ss)}
    h2 = [by_seq[("A", q)] for q in range(53, 64)]
    assert all(s == "H" for s in h2), h2
    counts = Counter(ss)
    assert counts["H"] >= 28               # both helices essentially found


def test_sheet_bridges_and_debug_cylinders(mol):
    res = build_residues(mol)
    hb = compute_hbonds(res)
    # The hairpin carries mutual Kabsch-Sander pairs (antiparallel bridges).
    mutual = sum(1 for i in range(len(res)) for j in hb[i] if i in hb[j])
    assert mutual >= 4
    cyl = build_sheet_hbond_cylinders(mol)
    assert cyl is not None and len(cyl[0]) >= 8


def test_cartoon_mesh_builds(mol):
    mesh = build_backbone_cartoon(mol)
    pos = np.asarray(mesh.positions)
    assert pos.shape[0] > 5000
    assert np.isfinite(pos).all()
    # Sheet (green) and helix (red) triangle colors both present
    cols = np.asarray(mesh.tri_colors)
    assert (np.abs(cols - np.array([0.30, 0.69, 0.31])) < 0.2).all(1).any()
    assert (np.abs(cols - np.array([0.96, 0.26, 0.21])) < 0.3).all(1).any()


def test_pipeline_cartoon_render_smoke(mol):
    """Full pipeline: cartoon + ligand ball-and-stick through the scene
    compiler and one progressive frame."""
    from webgl_raytracer_tpu.app.pipeline import load_molecule_scene
    from webgl_raytracer_tpu.render import Renderer

    loaded = load_molecule_scene(mol, display_style="cartoon")
    assert loaded.scene.tri_count > 1000
    assert loaded.scene.sphere_count >= 10   # HETATM ligand atoms stay b&s
    r = Renderer(loaded.scene, width=48, height=48)
    r.settings.tone_map = "linear"
    r.render_frames(1)
    img = np.asarray(r.accumulated())
    assert np.isfinite(img).all() and img.max() > 0.0


def test_generator_is_deterministic(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(ASSET), "..", "..",
                                      "tools", "make_test_protein.py")],
        capture_output=True, text=True)
    assert out.returncode == 0
    with open(ASSET) as f:
        text = f.read()
    assert "HELIX" in text and text.count("CONECT") == 6
