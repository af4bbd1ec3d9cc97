"""Generate the golden reference-layout Gaussian PLY fixture.

Writes `golden_gaussians.ply` with the EXACT attribute schema of the
reference's GaussianModel.save_ply (gaussian_model.py:277-308):
x,y,z, nx,ny,nz, f_dc_0..2, f_rest_0..44, opacity, scale_0..2, rot_0..3 —
all little-endian float32, f_rest flattened channel-major (3 x 15).

This generator is deliberately independent of gaussian_splatting_tpu —
plain struct-format numpy with a hand-built header — so the fixture pins
ecosystem compatibility by construction *outside* the code under test.

Run from the repo root:  python tests/fixtures/make_golden_ply.py
The fixture is checked in; regenerate only if the spec itself changes
(it should not — it is the de-facto 3DGS interchange format).
"""

import os

import numpy as np

P = 8


def build_columns():
    """Deterministic, render-able values: a ring of 8 gaussians."""
    i = np.arange(P, dtype=np.float32)
    ang = i * (2.0 * np.pi / P)
    cols = {}
    cols["x"] = 0.8 * np.cos(ang)
    cols["y"] = 0.8 * np.sin(ang)
    cols["z"] = 0.1 * (i - 3.5)
    for k in ("nx", "ny", "nz"):
        cols[k] = np.zeros(P, np.float32)
    # DC color: distinct hues (pre-SH values around 1/C0 scale)
    cols["f_dc_0"] = 0.5 + 0.5 * np.cos(ang)
    cols["f_dc_1"] = 0.5 + 0.5 * np.sin(ang)
    cols["f_dc_2"] = 1.0 - 0.1 * i
    # rest: small deterministic values, channel-major 3x15
    for c in range(3):
        for m in range(15):
            cols[f"f_rest_{c * 15 + m}"] = np.float32(0.01) * np.sin(
                np.float32(1.0) + i + c * 7 + m
            ).astype(np.float32)
    cols["opacity"] = np.full(P, 2.0, np.float32)  # sigmoid -> 0.88
    for s in range(3):
        cols[f"scale_{s}"] = np.full(P, -2.5, np.float32) - 0.1 * s  # exp -> ~0.08
    cols["rot_0"] = np.ones(P, np.float32)
    for r in (1, 2, 3):
        cols[f"rot_{r}"] = np.zeros(P, np.float32)
    return cols


def main():
    cols = build_columns()
    names = list(cols.keys())
    header = (
        ["ply", "format binary_little_endian 1.0", f"element vertex {P}"]
        + [f"property float {n}" for n in names]
        + ["end_header"]
    )
    rec = np.empty(P, np.dtype([(n, "<f4") for n in names]))
    for n in names:
        rec[n] = np.asarray(cols[n], np.float32)
    out = os.path.join(os.path.dirname(__file__), "golden_gaussians.ply")
    with open(out, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
