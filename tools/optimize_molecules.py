#!/usr/bin/env python3
"""Generate optimized 3D structures for the built-in molecules from
SMILES using RDKit ETKDGv3 + MMFF94 (parity with the reference
scripts/optimize_molecules.py). Writes SDF files into
webgl_raytracer_tpu/assets/molecules/. Requires rdkit."""

import argparse
import os
import sys

SMILES = {
    "caffeine": "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
    "aspirin": "CC(=O)OC1=CC=CC=C1C(=O)O",
    "benzene": "c1ccccc1",
    "ethanol": "CCO",
    "ibuprofen": "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "glucose": "OC[C@H]1OC(O)[C@H](O)[C@@H](O)[C@@H]1O",
}

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "webgl_raytracer_tpu", "assets", "molecules")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", nargs="*", help="subset of molecule names")
    args = p.parse_args()
    try:
        from rdkit import Chem
        from rdkit.Chem import AllChem
    except ImportError:
        print("rdkit is not installed; the shipped SDF assets were "
              "generated with ETKDGv3 seed 42 + MMFF94.")
        sys.exit(1)

    names = args.only or SMILES.keys()
    for name in names:
        mol = Chem.AddHs(Chem.MolFromSmiles(SMILES[name]))
        params = AllChem.ETKDGv3()
        params.randomSeed = args.seed
        AllChem.EmbedMolecule(mol, params)
        AllChem.MMFFOptimizeMolecule(mol)
        block = Chem.MolToMolBlock(mol)
        out = os.path.join(OUT_DIR, f"{name}.sdf")
        with open(out, "w") as f:
            f.write(f"{name.capitalize()}\n     RDKit          3D\n\n")
            f.write("\n".join(block.split("\n")[3:]))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
