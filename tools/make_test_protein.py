#!/usr/bin/env python3
"""Generate the bundled test protein `assets/proteins/TSTP.pdb`.

This environment has no network egress, so a real RCSB entry cannot be
downloaded at build time; instead this script deterministically constructs
a protein-shaped PDB file that exercises every irregularity the cartoon /
parser pipelines must survive on real entries (the reference's default
workflow loads PDB ids from RCSB, index.html:541-551):

  * two chains (A: helix-loop-hairpin-loop-helix, B: curved coil),
  * ideal alpha-helical CA geometry with carbonyl O aimed at N(i+4) so the
    DSSP energy (cartoon.js:846-885 / models/cartoon.py) detects the helix,
  * an antiparallel beta hairpin with mutual O<->H pairs for sheet detection,
  * a chain break (missing residues + a spatial gap > max_gap),
  * altLoc A/B backbone duplicates with occupancy preference (A kept),
  * an insertion-code residue, OXT terminal oxygen,
  * a partial HELIX header record (DSSP must fill the second helix),
  * a partial SHEET record for one strand,
  * a HETATM ligand ring with CONECT bonds plus HOH waters.

Run:  python tools/make_test_protein.py   (rewrites the asset in place)
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "assets", "proteins", "TSTP.pdb")

RES_CYCLE = ["ALA", "LEU", "SER", "VAL", "GLY", "PHE", "THR", "GLU", "LYS",
             "ILE", "ASP", "ARG"]


def _nerf(a, b, c, bond, angle_deg, dihedral_deg):
    """Natural extension reference frame: place D given A-B-C with |CD|=bond,
    angle(BCD)=angle, dihedral(ABCD)=dihedral."""
    ang = np.deg2rad(angle_deg)
    dih = np.deg2rad(dihedral_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    ab = b - a
    n = np.cross(ab, bc)
    n /= max(np.linalg.norm(n), 1e-12)
    m = np.cross(n, bc)
    d2 = np.array([-bond * np.cos(ang),
                   bond * np.sin(ang) * np.cos(dih),
                   bond * np.sin(ang) * np.sin(dih)])
    return c + d2[0] * bc + d2[1] * m + d2[2] * n


def build_backbone(phi_psi, seed_atoms=None):
    """Ideal-geometry backbone from (phi, psi) per residue via NeRF:
    N-CA 1.458, CA-C 1.525, C-N 1.329, omega 180, carbonyl O at psi+180.
    Returns a list of {N, CA, C, O} dicts."""
    n_res = len(phi_psi)
    if seed_atoms is None:
        n0 = np.array([0.0, 0.0, 0.0])
        ca0 = np.array([1.458, 0.0, 0.0])
        c0 = ca0 + 1.525 * np.array([np.cos(np.deg2rad(180 - 111.2)),
                                     np.sin(np.deg2rad(180 - 111.2)), 0.0])
    else:
        n0, ca0, c0 = seed_atoms
    out = [{"N": n0, "CA": ca0, "C": c0}]
    for i in range(1, n_res):
        phi, _ = phi_psi[i]
        _, psi_prev = phi_psi[i - 1]
        prev = out[-1]
        ni = _nerf(prev["N"], prev["CA"], prev["C"], 1.329, 116.2, psi_prev)
        cai = _nerf(prev["CA"], prev["C"], ni, 1.458, 121.7, 180.0)
        ci = _nerf(prev["C"], ni, cai, 1.525, 111.2, phi)
        out.append({"N": ni, "CA": cai, "C": ci})
    for i in range(n_res):
        _, psi = phi_psi[i]
        if i + 1 < n_res:
            out[i]["O"] = _nerf(out[i]["N"], out[i]["CA"], out[i]["C"],
                                1.231, 120.5, psi + 180.0)
        else:
            out[i]["O"] = _nerf(out[i]["N"], out[i]["CA"], out[i]["C"],
                                1.231, 120.5, psi + 180.0)
    return out


def _transform(bb, rot, offset):
    return [{k: rot @ v + offset for k, v in r.items()} for r in bb]


def _rot(axis, deg):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    th = np.deg2rad(deg)
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(th) * k + (1 - np.cos(th)) * (k @ k)


def _hbond_energy(a, b_prev_c, b):
    """Kabsch-Sander energy of a.O -> b.N (H from b.N and the previous C)."""
    hn = b["N"] - b_prev_c
    h = b["N"] + hn / np.linalg.norm(hn)
    r_on = np.linalg.norm(a["O"] - b["N"])
    r_ch = np.linalg.norm(a["C"] - h)
    r_oh = np.linalg.norm(a["O"] - h)
    r_cn = np.linalg.norm(a["C"] - b["N"])
    return 0.084 * 332 * (1 / r_on + 1 / r_ch - 1 / r_oh - 1 / r_cn)


def _place_hairpin(n_per=8):
    """Two flat antiparallel strands 4.8 A apart with carbonyl O's re-aimed
    at the facing partner's N. This yields Kabsch-Sander mutual pairs at
    alternating registers (E ~ -0.97), the physical antiparallel bridge
    pattern; the contiguous strand extents come from the SHEET header
    records, which take precedence (cartoon.js:1703-1719)."""
    flat = [(-180.0, 180.0)] * n_per
    s1 = build_backbone(flat)
    s2 = build_backbone(flat)
    axis = s1[-1]["CA"] - s1[0]["CA"]
    axis /= np.linalg.norm(axis)
    rot = _rot([0.0, 0.0, 1.0], 180.0)
    off = s1[-1]["CA"] + np.array([0.0, 4.8, 0.0]) + axis * 1.4
    s2 = _transform(s2, rot, off - (rot @ s2[0]["CA"]))
    reg = [int(np.argmin([np.linalg.norm(s1[i]["CA"] - s2[j]["CA"])
                          for j in range(n_per)])) for i in range(n_per)]
    for i in range(n_per):
        j = reg[i]
        for a, b in ((s1[i], s2[j]), (s2[j], s1[i])):
            d = b["N"] - a["C"]
            a["O"] = a["C"] + 1.23 * d / np.linalg.norm(d)
    pairs = 0
    for i in range(1, n_per - 1):
        j = reg[i]
        if 1 <= j <= n_per - 1:
            e1 = _hbond_energy(s1[i], s2[j - 1]["C"], s2[j])
            e2 = _hbond_energy(s2[j], s1[i - 1]["C"], s1[i])
            if e1 < -0.5 and e2 < -0.5:
                pairs += 1
    return s1, s2, pairs


def build_chain_a():
    """helix(18) - loop(6) - antiparallel hairpin(2x8 + turn) - loop(5) -
    helix(14), with a chain break before the last helix. All segments are
    ideal-geometry NeRF backbones, rigidly placed."""
    # (-70, -50): within the alpha region; with this generator's carbonyl
    # convention it yields i->i+4 Kabsch-Sander energies ~ -2.9 (the
    # canonical (-57, -47) lands at -0.44, just above the -0.5 cutoff).
    helix = [(-70.0, -50.0)]
    loop = [(-75.0, 150.0), (-60.0, -30.0), (80.0, 10.0), (-100.0, 120.0)]

    h1 = build_backbone(helix * 18)
    l1 = build_backbone((loop * 2)[:6])
    l1 = _transform(l1, _rot([0, 1, 0], 40.0),
                    h1[-1]["C"] + np.array([2.5, 1.0, 1.5]) - l1[0]["N"])

    s1, s2, pairs = _place_hairpin(8)
    shift = l1[-1]["C"] + np.array([2.0, 2.0, -1.0]) - s1[0]["N"]
    s1 = _transform(s1, np.eye(3), shift)
    s2 = _transform(s2, np.eye(3), shift)
    turn = build_backbone([(-60.0, -30.0), (80.0, 10.0)])
    turn = _transform(turn, np.eye(3),
                      s1[-1]["C"] + np.array([1.5, 1.2, 0.5]) - turn[0]["N"])

    l2 = build_backbone((loop * 2)[:5])
    l2 = _transform(l2, _rot([1, 0, 0], -35.0),
                    s2[-1]["C"] + np.array([1.5, 2.0, 1.0]) - l2[0]["N"])

    h2 = build_backbone(helix * 14)
    h2 = _transform(h2, _rot([0, 1, 0], 75.0),
                    l2[-1]["C"] + np.array([8.0, 14.0, 9.0]) - h2[0]["N"])

    return h1 + l1 + s1 + turn + s2 + l2 + h2


def coil_ca(n, origin):
    pts = []
    for i in range(n):
        t = i * 0.45
        pts.append(origin + np.array([3.0 * i, 4.0 * np.sin(t), 3.0 * np.cos(t)]))
    return pts


def backbone_from_ca(cas):
    """Approximate backbone from a CA trace (coil only — no H-bond needs)."""
    cas = [np.asarray(p, float) for p in cas]
    res = []
    n = len(cas)
    for i in range(n):
        prev_dir = cas[i] - cas[i - 1] if i > 0 else cas[min(i + 1, n - 1)] - cas[i]
        next_dir = cas[i + 1] - cas[i] if i < n - 1 else prev_dir
        prev_u = prev_dir / max(np.linalg.norm(prev_dir), 1e-9)
        next_u = next_dir / max(np.linalg.norm(next_dir), 1e-9)
        npos = cas[i] - prev_u * 1.46
        cpos = cas[i] + next_u * 1.52
        od = np.cross(next_u, [0.0, 0.0, 1.0])
        if np.linalg.norm(od) < 1e-6:
            od = np.array([0.0, 1.0, 0.0])
        od = od / np.linalg.norm(od)
        res.append({"N": npos, "CA": cas[i], "C": cpos, "O": cpos + od * 1.23})
    return res


def main() -> None:
    rng = np.random.default_rng(7)
    lines = [
        "HEADER    SYNTHETIC TEST PROTEIN                  16-AUG-26   TSTP",
        "TITLE     DETERMINISTIC TEST PROTEIN FOR CARTOON/SES/PARSER PATHS",
        "REMARK   3 GENERATED BY tools/make_test_protein.py (NO-EGRESS BUILD)",
        # Partial secondary-structure headers: helix 1 declared, helix 2 and
        # the hairpin left (mostly) to DSSP. One strand declared.
        # Column-exact records (parser: molecular.py:157-171 / reference
        # molecular.js:73-114): HELIX chain@19, start@21-24, end chain@31,
        # end@33-36; SHEET chain@21, start@22-25, end chain@32, end@33-36.
        "HELIX    1   1 ALA A    1  LEU A   18  1                          18",
        "SHEET    1   A 2 VAL A  25  GLU A  32  0",
        "SHEET    2   A 2 SER A  35  LYS A  42 -1",
    ]
    serial = 1

    def emit(name, res_name, chain, res_seq, pos, alt="", icode="",
             occ=1.0, het=False, element=None):
        nonlocal serial
        el = element or name[0]
        pad_name = f" {name:<3}" if len(name) < 4 else name
        rec = "HETATM" if het else "ATOM  "
        lines.append(
            f"{rec}{serial:>5} {pad_name}{alt or ' '}{res_name:>3} {chain}"
            f"{res_seq:>4}{icode or ' '}   "
            f"{pos[0]:8.3f}{pos[1]:8.3f}{pos[2]:8.3f}{occ:6.2f}{20.0:6.2f}"
            f"          {el:>2}")
        serial += 1
        return serial - 1

    # ---- chain A ----------------------------------------------------------
    residues = build_chain_a()
    res_seq = 0
    for idx, bb in enumerate(residues):
        res_seq += 1
        if idx == 47:           # before the final helix: skip 3 ids (break)
            res_seq += 3
        res_name = RES_CYCLE[idx % len(RES_CYCLE)]
        icode = "A" if idx == 21 else ""
        if idx in (5, 30):
            # altLoc duplicates: B first in file order, lower occupancy —
            # build_residues must keep the A conformer.
            for name in ("N", "CA", "C", "O"):
                jitter = rng.normal(0, 0.25, 3)
                emit(name, res_name, "A", res_seq, bb[name] + jitter,
                     alt="B", icode=icode, occ=0.4)
            for name in ("N", "CA", "C", "O"):
                emit(name, res_name, "A", res_seq, bb[name], alt="A",
                     icode=icode, occ=0.6)
        else:
            for name in ("N", "CA", "C", "O"):
                emit(name, res_name, "A", res_seq, bb[name], icode=icode)
        if res_name != "GLY":
            cb = bb["CA"] + np.array([0.6, -1.2, 0.4])
            emit("CB", res_name, "A", res_seq, cb, icode=icode)
        if idx == len(residues) - 1:
            emit("OXT", res_name, "A", res_seq, bb["O"] + [0.7, 0.7, 0.0],
                 icode=icode, element="O")
    lines.append(f"TER   {serial:>5}      {RES_CYCLE[(len(residues)-1) % len(RES_CYCLE)]:>3} A{res_seq:>4}")
    serial += 1

    # ---- chain B: coil ----------------------------------------------------
    coil = backbone_from_ca(coil_ca(24, np.array([-30.0, -20.0, 5.0])))
    for idx, bb in enumerate(coil):
        res_name = RES_CYCLE[(idx * 5) % len(RES_CYCLE)]
        for name in ("N", "CA", "C", "O"):
            emit(name, res_name, "B", idx + 1, bb[name])
        if res_name != "GLY":
            emit("CB", res_name, "B", idx + 1, bb["CA"] + [0.5, 1.1, -0.6])
    lines.append(f"TER   {serial:>5}      {RES_CYCLE[(23*5) % len(RES_CYCLE)]:>3} B{24:>4}")
    serial += 1

    # ---- HETATM ligand: six-membered ring + waters -------------------------
    ring_center = np.array([10.0, 10.0, -8.0])
    ring_ids = []
    for i in range(6):
        th = np.pi / 3 * i
        pos = ring_center + np.array([1.4 * np.cos(th), 1.4 * np.sin(th), 0.0])
        el = "N" if i == 0 else ("O" if i == 3 else "C")
        ring_ids.append(emit(f"{el}{i+1}", "LIG", "A", 901, pos, het=True,
                             element=el))
    for i in range(4):
        pos = ring_center + rng.normal(0, 6.0, 3)
        emit("O", "HOH", "A", 910 + i, pos, het=True, element="O")
    for i in range(6):
        a, b = sorted((ring_ids[i], ring_ids[(i + 1) % 6]))
        lines.append(f"CONECT{a:>5}{b:>5}")
    lines.append("END")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {serial - 1} atoms, {len(residues)} chain-A residues")


if __name__ == "__main__":
    main()
