"""Cartoon pipeline tests — mirrors reference tests/cartoon.test.mjs:
mesh-generation sanity, missing-backbone errors, sheet normals orthogonal
to H-bond directions, per-strand diagnostics, tapered widths, arrow trim
math, and DSSP assignment logic."""

import numpy as np
import pytest

from webgl_raytracer_tpu.models.cartoon import (
    adjust_short_segments,
    assign_secondary_structure,
    build_backbone_cartoon,
    build_residues,
    build_sheet_hbond_cylinders,
    compute_hbonds,
    compute_ribbon_half_widths,
    compute_sheet_normals,
    compute_sheet_strand_diagnostics,
    make_tapered_widths,
    segment_by_type,
    trim_polyline_tail,
    DEFAULT_OPTIONS,
)
from webgl_raytracer_tpu.models.mesh import merge_meshes, TriangleMesh
from webgl_raytracer_tpu.models.molecular import MolData, SecondaryRange


def make_mol(residue_atoms, helices=None, sheets=None):
    """Build MolData from a list of residues, each a dict with chain,
    res_seq and positions for N/CA/C/O."""
    positions, elements, names = [], [], []
    chain_ids, res_seqs, res_names = [], [], []
    for res in residue_atoms:
        for name in ("N", "CA", "C", "O"):
            positions.append(res[name])
            elements.append("C" if name == "CA" else name[0])
            names.append(name)
            chain_ids.append(res.get("chain", "A"))
            res_seqs.append(res["res_seq"])
            res_names.append(res.get("res_name", "ALA"))
    n = len(positions)
    return MolData(
        positions=np.asarray(positions, np.float32),
        elements=elements,
        serials=np.arange(1, n + 1, dtype=np.int32),
        names=names,
        is_het=np.zeros(n, bool),
        bonds=np.zeros((0, 2), np.int32),
        alt_locs=[""] * n,
        res_names=res_names,
        chain_ids=chain_ids,
        res_seqs=np.asarray(res_seqs, np.int32),
        res_seq_valid=np.ones(n, bool),
        i_codes=[""] * n,
        occupancies=np.ones(n, np.float32),
        helices=helices or [],
        sheets=sheets or [],
    )


def curve_residues(count, chain="A", start=1, offset=(0.0, 0.0, 0.0)):
    """Smooth curved backbone; local peptide geometry approximated."""
    out = []
    for i in range(count):
        t = i * 0.4
        ca = np.array([3.8 * i, 1.5 * np.sin(t), 1.5 * np.cos(t)]) + offset
        out.append({
            "chain": chain,
            "res_seq": start + i,
            "N": ca + [-0.7, 0.6, 0.0],
            "CA": ca,
            "C": ca + [0.9, 0.5, 0.0],
            "O": ca + [1.0, 1.6, 0.0],
        })
    return out


def parallel_strand_pair(length=5):
    """Two straight parallel strands along +x, separated in y, with O of
    strand A pointing at N of strand B (H-bond direction = +y)."""
    res = []
    for i in range(length):
        x = 3.4 * i
        res.append({
            "chain": "A", "res_seq": 1 + i,
            "N": np.array([x - 0.7, 0.0, 0.0]),
            "CA": np.array([x, 0.0, 0.0]),
            "C": np.array([x + 0.9, 0.2, 0.0]),
            "O": np.array([x + 0.9, 1.3, 0.0]),
        })
    for i in range(length):
        x = 3.4 * i
        res.append({
            "chain": "B", "res_seq": 1 + i,
            "N": np.array([x - 0.7, 4.0, 0.0]),
            "CA": np.array([x, 4.0, 0.0]),
            "C": np.array([x + 0.9, 4.2, 0.0]),
            "O": np.array([x + 0.9, 5.3, 0.0]),
        })
    return res


class TestResidues:
    def test_build_residues_complete(self):
        mol = make_mol(curve_residues(5))
        residues = build_residues(mol)
        assert len(residues) == 5
        assert all(r.complete for r in residues)
        assert residues[0].plane_normal is not None

    def test_missing_backbone_raises(self):
        residues = curve_residues(4)
        del residues[2]["O"]
        # Rebuild mol without the O of residue 2.
        mol = make_mol([r for r in residues[:2]] + [
            {k: v for k, v in residues[2].items() if k != "O"} | {"O": None}
        ] + residues[3:]) if False else None
        # Simpler: drop the O atom row entirely.
        rows = curve_residues(4)
        positions, elements, names, chains, seqs = [], [], [], [], []
        for i, res in enumerate(rows):
            for name in ("N", "CA", "C", "O"):
                if i == 2 and name == "O":
                    continue
                positions.append(res[name])
                elements.append("C" if name == "CA" else name[0])
                names.append(name)
                chains.append("A")
                seqs.append(res["res_seq"])
        n = len(positions)
        mol = MolData(
            positions=np.asarray(positions, np.float32),
            elements=elements,
            serials=np.arange(1, n + 1, dtype=np.int32),
            names=names, is_het=np.zeros(n, bool),
            bonds=np.zeros((0, 2), np.int32),
            alt_locs=[""] * n, res_names=["ALA"] * n, chain_ids=chains,
            res_seqs=np.asarray(seqs, np.int32),
            res_seq_valid=np.ones(n, bool), i_codes=[""] * n,
            occupancies=np.ones(n, np.float32),
        )
        with pytest.raises(ValueError, match="complete backbone"):
            build_backbone_cartoon(mol)

    def test_oxt_counts_as_o(self):
        rows = curve_residues(4)
        mol = make_mol(rows)
        mol.names = ["OXT" if nm == "O" and i // 4 == 3 else nm
                     for i, nm in enumerate(mol.names)]
        residues = build_residues(mol)
        assert residues[3].complete


class TestSecondaryStructure:
    def test_helix_from_i_i4_hbonds(self):
        mol = make_mol(curve_residues(10))
        residues = build_residues(mol)
        hbonds = [set() for _ in range(10)]
        for i in range(0, 5):
            hbonds[i].add(i + 4)
        ss = assign_secondary_structure(residues, hbonds)
        assert ss[1:9] == ["H"] * 8
        assert ss[0] == "C"

    def test_sheet_from_mutual_pairs(self):
        mol = make_mol(curve_residues(12))
        residues = build_residues(mol)
        hbonds = [set() for _ in range(12)]
        hbonds[2].add(9)
        hbonds[9].add(2)
        ss = assign_secondary_structure(residues, hbonds)
        assert ss[2] == "E" and ss[9] == "E"

    def test_short_segment_cleanup(self):
        mol = make_mol(curve_residues(10))
        residues = build_residues(mol)
        ss = ["C", "H", "H", "H", "C", "E", "C", "H", "H", "C"]
        adjusted = adjust_short_segments(residues, ss)
        assert adjusted[1:4] == ["C"] * 3      # helix of 3 < minHelix 4
        assert adjusted[5] == "C"              # sheet of 1 < minSheet 2
        assert adjusted[7:9] == ["C"] * 2

    def test_pdb_ranges_take_precedence(self):
        helix_range = SecondaryRange("A", 2, "", 7, "", "A")
        mol = make_mol(curve_residues(10), helices=[helix_range])
        mesh = build_backbone_cartoon(mol)
        assert mesh.num_triangles > 0

    def test_hbond_energy_cutoff(self):
        # O of res0 placed 2.9 A from N of res2 with good geometry -> bond.
        rows = curve_residues(4)
        rows[0]["O"] = rows[2]["N"] + np.array([0.0, 2.9, 0.0])
        mol = make_mol(rows)
        residues = build_residues(mol)
        hbonds = compute_hbonds(residues)
        assert isinstance(hbonds[0], set)


class TestSheetNormals:
    def test_normals_orthogonal_to_hbond_direction(self):
        mol = make_mol(parallel_strand_pair())
        residues = build_residues(mol)
        ss = ["E"] * len(residues)
        hbonds = compute_hbonds(residues)
        normals = compute_sheet_normals(residues, ss, hbonds)
        # H-bond direction is ~+y; strand tangent +x; normal should be ~±z.
        for n in normals:
            assert n is not None
            assert abs(n[1]) < 0.15
            assert abs(abs(n[2]) - 1.0) < 0.15

    def test_diagnostics_counts_and_angles(self):
        mol = make_mol(parallel_strand_pair())
        residues = build_residues(mol)
        ss = ["E"] * len(residues)
        hbonds = compute_hbonds(residues)
        normals = compute_sheet_normals(residues, ss, hbonds)
        segments = segment_by_type(residues, ss, DEFAULT_OPTIONS["max_gap"])
        diags = compute_sheet_strand_diagnostics(residues, ss, hbonds, normals, segments)
        assert len(diags) == 2
        for d in diags:
            assert d["total_count"] > 0
            if d["angle_count"]:
                assert 70.0 <= d["angle_mean"] <= 110.0


class TestGeometryHelpers:
    def test_tapered_widths(self):
        w = make_tapered_widths(20, 2.0, 0.5, 0.2)
        assert w[0] == pytest.approx(0.5)
        assert w[10] == pytest.approx(2.0)
        assert w[-1] == pytest.approx(0.5)
        assert (np.diff(w[:5]) >= -1e-9).all()

    def test_ribbon_half_widths(self):
        half_w, edge = compute_ribbon_half_widths(2.0, 0.72)
        assert half_w == pytest.approx(1.0)
        assert edge == pytest.approx(0.72)
        _, edge_clamped = compute_ribbon_half_widths(2.0, 0.05)
        assert edge_clamped == pytest.approx(0.2)  # clamped to 0.2x

    def test_trim_polyline_tail(self):
        points = [np.array([float(i), 0, 0]) for i in range(5)]
        res = trim_polyline_tail(points, None, 1.5)
        assert res is not None
        np.testing.assert_allclose(res["base_point"], [2.5, 0, 0], atol=1e-9)
        np.testing.assert_allclose(res["base_tangent"], [1, 0, 0], atol=1e-9)
        assert res["arrow_length"] == pytest.approx(1.5)
        assert len(res["body_points"]) == 4

    def test_trim_respects_min_body(self):
        points = [np.array([0.0, 0, 0]), np.array([1.0, 0, 0])]
        res = trim_polyline_tail(points, None, 10.0, min_body_length=0.6)
        assert res["arrow_length"] == pytest.approx(0.4)


class TestMeshGeneration:
    def test_helix_sheet_loop_mesh(self):
        helix = SecondaryRange("A", 1, "", 6, "", "A")
        sheet = SecondaryRange("A", 9, "", 13, "", "A")
        mol = make_mol(curve_residues(16), helices=[helix], sheets=[sheet])
        mesh = build_backbone_cartoon(mol)
        assert mesh.num_triangles > 100
        assert mesh.num_vertices > 100
        assert np.isfinite(mesh.positions).all()
        assert np.isfinite(mesh.normals).all()
        assert mesh.indices.max() < mesh.num_vertices
        # Contains helix-front red, sheet green and loop gray triangles.
        colors = {tuple(round(float(x), 2) for x in c) for c in mesh.tri_colors}
        assert (0.85, 0.1, 0.1) in colors
        assert (0.2, 0.7, 0.2) in colors
        assert (0.65, 0.65, 0.65) in colors

    def test_too_few_residues_raises(self):
        mol = make_mol(curve_residues(3))
        with pytest.raises(ValueError, match="four residues"):
            build_backbone_cartoon(mol)

    def test_hbond_debug_cylinders(self):
        mol = make_mol(parallel_strand_pair(),
                       sheets=[SecondaryRange("A", 1, "", 5, "", "A"),
                               SecondaryRange("B", 1, "", 5, "", "B")])
        p1, p2, radii, colors = build_sheet_hbond_cylinders(mol)
        assert p1.shape[0] > 0
        assert (radii > 0).all()

    def test_merge_meshes(self):
        helix = SecondaryRange("A", 1, "", 6, "", "A")
        mol = make_mol(curve_residues(8), helices=[helix])
        a = build_backbone_cartoon(mol)
        b = build_backbone_cartoon(mol)
        merged = merge_meshes(a, b)
        assert merged.num_triangles == 2 * a.num_triangles
        assert merged.num_vertices == 2 * a.num_vertices
        assert merged.indices[a.num_triangles:].min() >= a.num_vertices
        assert merge_meshes(None, a).num_triangles == a.num_triangles
        assert merge_meshes(a, TriangleMesh()).num_triangles == a.num_triangles
