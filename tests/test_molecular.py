"""Molecular parser tests — mirrors the reference suite
(/root/reference/tests/molecular.test.mjs) plus bond-inference coverage."""

import numpy as np
import pytest

from webgl_raytracer_tpu.models import (
    get_builtin_molecule,
    molecule_to_geometry,
    parse_auto_detect,
    parse_pdb,
    parse_sdf,
    split_by_hetatm,
    BUILTIN_MOLECULE_NAMES,
)


def pdb_atom_line(serial, name, res_name, chain, res_seq, x, y, z, element, het=False,
                  alt_loc=" ", i_code=" ", occupancy=1.0):
    """Column-exact PDB ATOM/HETATM record builder.

    Follows the PDB name-alignment convention: one-letter-element atom names
    are right-shifted by one column (" CA " = alpha carbon; "FE  " = iron).
    """
    record = "HETATM" if het else "ATOM  "
    if len(element.strip()) == 1 and len(name) <= 3:
        name = " " + name
    return (
        f"{record}{serial:>5} {name:<4}{alt_loc}{res_name:<3} {chain}{res_seq:>4}{i_code}   "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{occupancy:6.2f}{0.0:6.2f}          {element:>2}"
    )


SIMPLE_PDB = "\n".join([
    pdb_atom_line(1, "N", "ALA", "A", 1, 0.0, 0.0, 0.0, "N"),
    pdb_atom_line(2, "CA", "ALA", "A", 1, 1.45, 0.0, 0.0, "C"),
    pdb_atom_line(3, "O", "HOH", "B", 2, 10.0, 0.0, 0.0, "O", het=True),
    "CONECT    1    2",
    "END",
])


class TestParsePDB:
    def test_atoms(self):
        mol = parse_pdb(SIMPLE_PDB)
        assert mol.num_atoms == 3
        assert mol.elements == ["N", "C", "O"]
        np.testing.assert_allclose(mol.positions[1], [1.45, 0.0, 0.0], atol=1e-6)
        assert list(mol.is_het) == [False, False, True]
        assert mol.chain_ids == ["A", "A", "B"]
        assert list(mol.res_seqs) == [1, 1, 2]

    def test_conect_bonds(self):
        mol = parse_pdb(SIMPLE_PDB)
        assert mol.num_bonds == 1
        assert mol.bonds.tolist() == [[0, 1]]

    def test_het_split(self):
        std, het = split_by_hetatm(parse_pdb(SIMPLE_PDB))
        assert std.num_atoms == 2 and het.num_atoms == 1
        assert std.bonds.tolist() == [[0, 1]]
        assert het.num_bonds == 0
        assert het.elements == ["O"]

    def test_helix_sheet_records(self):
        text = "\n".join([
            "HELIX    1   1 ALA A    2  GLU A    8  1                                   7",
            "SHEET    1   A 2 VAL A  12  LEU A  16  0",
            pdb_atom_line(1, "CA", "ALA", "A", 2, 0, 0, 0, "C"),
        ])
        mol = parse_pdb(text)
        assert len(mol.helices) == 1
        assert (mol.helices[0].start_seq, mol.helices[0].end_seq) == (2, 8)
        assert mol.helices[0].chain_id == "A"
        assert len(mol.sheets) == 1
        assert (mol.sheets[0].start_seq, mol.sheets[0].end_seq) == (12, 16)

    def test_distance_bond_inference(self):
        # Two carbons 1.5 A apart bond (0.76+0.76+0.45 = 1.97 max); a third
        # 5 A away does not.
        text = "\n".join([
            pdb_atom_line(1, "C1", "LIG", "A", 1, 0.0, 0.0, 0.0, "C"),
            pdb_atom_line(2, "C2", "LIG", "A", 1, 1.5, 0.0, 0.0, "C"),
            pdb_atom_line(3, "C3", "LIG", "A", 1, 6.5, 0.0, 0.0, "C"),
        ])
        mol = parse_pdb(text)
        assert mol.bonds.tolist() == [[0, 1]]

    def test_two_letter_element(self):
        text = pdb_atom_line(1, "FE", "HEM", "A", 1, 0, 0, 0, "FE", het=True)
        mol = parse_pdb(text)
        assert mol.elements == ["Fe"]

    def test_element_inference_from_name_alignment(self):
        # No element column: " CA " is alpha carbon, "CA  " is calcium,
        # "FE  " is iron, "HG21" is a hydrogen (Hg not in tables).
        lines = [
            "ATOM      1  CA  ALA A   1       0.000   0.000   0.000  1.00  0.00",
            "HETATM    2 CA    CA A   2       5.000   0.000   0.000  1.00  0.00",
            "HETATM    3 FE   HEM A   3      10.000   0.000   0.000  1.00  0.00",
            "ATOM      4 HG21 VAL A   4      15.000   0.000   0.000  1.00  0.00",
        ]
        mol = parse_pdb("\n".join(lines))
        assert mol.elements == ["C", "Ca", "Fe", "H"]


class TestParseSDF:
    def test_builtin_counts(self):
        mol = get_builtin_molecule("caffeine")
        assert mol.num_atoms == 24
        assert mol.num_bonds == 25
        assert mol.elements.count("N") == 4
        assert mol.elements.count("O") == 2

    def test_all_builtins_parse(self):
        expected = {
            "caffeine": 24, "aspirin": 21, "benzene": 12,
            "ethanol": 9, "ibuprofen": 33, "glucose": 24,
        }
        for name in BUILTIN_MOLECULE_NAMES:
            mol = get_builtin_molecule(name)
            assert mol.num_atoms == expected[name]
            assert mol.num_bonds > 0

    def test_unknown_builtin_raises(self):
        with pytest.raises(ValueError):
            get_builtin_molecule("unobtainium")

    def test_bad_sdf_raises(self):
        with pytest.raises(ValueError):
            parse_sdf("too\nshort")


class TestAutoDetect:
    def test_pdb_by_content(self):
        assert parse_auto_detect(SIMPLE_PDB).num_atoms == 3

    def test_sdf_by_extension(self):
        import os
        sdf = open(os.path.join(
            os.path.dirname(__file__), "..",
            "webgl_raytracer_tpu", "assets", "molecules", "ethanol.sdf")).read()
        assert parse_auto_detect(sdf, "ethanol.sdf").num_atoms == 9


class TestGeometry:
    def test_ball_and_stick(self):
        mol = get_builtin_molecule("ethanol")
        geo = molecule_to_geometry(mol, radius_scale=0.4)
        assert geo.num_spheres == 9
        assert geo.num_cylinders == 8
        # Carbon VdW 1.70 * 0.4
        np.testing.assert_allclose(geo.sphere_radii[0], 0.68, atol=1e-6)
        # Oxygen is red-ish
        o_idx = mol.elements.index("O")
        assert geo.sphere_colors[o_idx][0] > 0.9
        assert geo.cyl_radii[0] == pytest.approx(0.15)

    def test_vdw_style(self):
        mol = get_builtin_molecule("benzene")
        geo = molecule_to_geometry(mol, radius_scale=1.0, bond_radius=0.0, show_bonds=False)
        assert geo.num_cylinders == 0
        np.testing.assert_allclose(geo.sphere_radii[0], 1.70, atol=1e-6)

    def test_empty(self):
        mol = parse_pdb("END\n")
        geo = molecule_to_geometry(mol)
        assert geo.num_spheres == 0 and geo.num_cylinders == 0


def test_fetch_pdb_cache_and_mock(tmp_path, monkeypatch):
    """fetch_pdb (molecular.js:412-420): RCSB URL, cache write, cache hit."""
    import io
    import urllib.request

    from webgl_raytracer_tpu.models.molecular import fetch_pdb

    pdb_text = (
        "ATOM      1  CA  ALA A   1       1.000   2.000   3.000"
        "  1.00  0.00           C\nEND\n")

    class FakeResp(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    calls = []

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        return FakeResp(pdb_text.encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    mol = fetch_pdb("1abc", cache_dir=str(tmp_path))
    assert mol.num_atoms == 1
    assert calls == ["https://files.rcsb.org/download/1ABC.pdb"]
    assert (tmp_path / "1ABC.pdb").exists()

    # Second call must hit the cache, not the network.
    mol2 = fetch_pdb("1abc", cache_dir=str(tmp_path))
    assert mol2.num_atoms == 1 and len(calls) == 1
