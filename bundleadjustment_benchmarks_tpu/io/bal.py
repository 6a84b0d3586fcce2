"""BAL (Bundle Adjustment in the Large) dataset ingestion.

File format (parsed by the reference at src/bundle_adjustment_large.cpp:59-108):

    N M K                    # cameras, points, observations
    camIdx ptIdx x y         # K observation lines
    <9 values per camera>    # Rodrigues omega(3), T(3), f, k1, k2
    <3 values per point>     # X Y Z

This module only tokenizes the raw values; the reference's quirky model
conventions (negative focal length, ``k1*f^2 / k2*f^4`` distortion pre-scaling,
measurement division by ``avg_focal_length``) are applied in
``models/problem.py`` so that raw BAL data stays round-trippable.

A native C++ tokenizer (native/balio.cpp) is used when its shared library has
been built (``make -C native``); otherwise a numpy fallback parses the file.
Both produce identical float64 token streams.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os

import numpy as np

_NATIVE_LIB = None
_NATIVE_TRIED = False


def _native_lib():
    """Load native/libbalio.so (fast C++ tokenizer) if built, else None."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libbalio.so"),
        os.path.join(os.path.dirname(__file__), "libbalio.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.balio_tokenize.restype = ctypes.c_longlong
                lib.balio_tokenize.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_longlong,
                ]
                _NATIVE_LIB = lib
                break
            except OSError:
                continue
    return _NATIVE_LIB


def _tokenize(path: str) -> np.ndarray:
    """Whitespace-tokenize a BAL text file into a flat float64 array.

    ``.gz`` paths are transparently decompressed (the repo ships its
    generated stand-ins for the reference's stripped large BAL blobs
    gzipped; see utils/balgen.py)."""
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as f:
            return np.array(f.read().split(), dtype=np.float64)
    lib = _native_lib()
    if lib is not None:
        size = os.path.getsize(path)
        # Upper bound on token count: one token needs >= 2 bytes (digit + sep).
        cap = size // 2 + 16
        out = np.empty(cap, dtype=np.float64)
        n = lib.balio_tokenize(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap,
        )
        if n >= 0:
            return out[:n]
        # Fall through to the numpy path on native failure.
    with open(path, "rb") as f:
        data = f.read()
    return np.array(data.split(), dtype=np.float64)


@dataclasses.dataclass
class BalDataset:
    """Raw BAL file contents (unmodified conventions: positive focal, raw k1/k2).

    Attributes:
      cam_idx: (K,) int32 observation -> camera index.
      pt_idx: (K,) int32 observation -> point index.
      measurements: (K, 2) float64 observed pixel coordinates.
      omega: (N, 3) float64 Rodrigues rotation vectors.
      translation: (N, 3) float64.
      focal: (N,) float64 (positive, as stored in the file).
      k1, k2: (N,) float64 raw radial distortion coefficients.
      points: (M, 3) float64.
    """

    cam_idx: np.ndarray
    pt_idx: np.ndarray
    measurements: np.ndarray
    omega: np.ndarray
    translation: np.ndarray
    focal: np.ndarray
    k1: np.ndarray
    k2: np.ndarray
    points: np.ndarray

    @property
    def n_cameras(self) -> int:
        return self.focal.shape[0]

    @property
    def n_points(self) -> int:
        return self.points.shape[0]

    @property
    def n_observations(self) -> int:
        return self.cam_idx.shape[0]


def read_bal(path: str) -> BalDataset:
    """Parse a BAL problem file (layout per reference bundle_adjustment_large.cpp:59-108)."""
    tok = _tokenize(path)
    if tok.size < 3:
        raise ValueError(f"{path}: not a BAL file (fewer than 3 header tokens)")
    n, m, k = int(tok[0]), int(tok[1]), int(tok[2])
    expect = 3 + 4 * k + 9 * n + 3 * m
    if tok.size != expect:
        raise ValueError(
            f"{path}: expected {expect} tokens for N={n} M={m} K={k}, got {tok.size}"
        )
    obs = tok[3 : 3 + 4 * k].reshape(k, 4)
    cams = tok[3 + 4 * k : 3 + 4 * k + 9 * n].reshape(n, 9)
    pts = tok[3 + 4 * k + 9 * n :].reshape(m, 3)
    cam_idx = obs[:, 0].astype(np.int32)
    pt_idx = obs[:, 1].astype(np.int32)
    if cam_idx.size and (cam_idx.min() < 0 or cam_idx.max() >= n):
        raise ValueError(f"{path}: camera index out of range")
    if pt_idx.size and (pt_idx.min() < 0 or pt_idx.max() >= m):
        raise ValueError(f"{path}: point index out of range")
    return BalDataset(
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        measurements=np.ascontiguousarray(obs[:, 2:4]),
        omega=np.ascontiguousarray(cams[:, 0:3]),
        translation=np.ascontiguousarray(cams[:, 3:6]),
        focal=np.ascontiguousarray(cams[:, 6]),
        k1=np.ascontiguousarray(cams[:, 7]),
        k2=np.ascontiguousarray(cams[:, 8]),
        points=pts,
    )


def write_bal(path: str, ds: BalDataset) -> None:
    """Write a BalDataset back to BAL text format (inverse of read_bal)."""
    with open(path, "w") as f:
        f.write(f"{ds.n_cameras} {ds.n_points} {ds.n_observations}\n")
        for c, p, (x, y) in zip(ds.cam_idx, ds.pt_idx, ds.measurements):
            f.write(f"{c} {p} {x:.12e} {y:.12e}\n")
        cams = np.concatenate(
            [
                ds.omega,
                ds.translation,
                ds.focal[:, None],
                ds.k1[:, None],
                ds.k2[:, None],
            ],
            axis=1,
        )
        for row in cams.reshape(-1):
            f.write(f"{row:.16e}\n")
        for v in ds.points.reshape(-1):
            f.write(f"{v:.16e}\n")
