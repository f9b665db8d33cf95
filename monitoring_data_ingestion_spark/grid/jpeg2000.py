"""Pure-Python JPEG 2000 (ISO/IEC 15444-1) codec — the GRIB2 template
5.40 payload format.

Parity contract: the reference shells out to ``wgrib2`` for file
conversion (/root/reference/src/file-conversions.js:49-51,76-112),
whose bundled g2clib decodes JPEG2000-packed GRIB2 fields via
jasper/openjpeg.  This module implements the subset those encoders
emit for GRIB data so the landing source can decode such archives
without native libraries:

* one tile, one component, no JP2 container (raw codestream),
* reversible 5/3 integer wavelet, no quantization (lossless),
* one quality layer, one precinct per resolution (default 2^15),
* 64x64 code-blocks, default code-block style (no bypass / reset /
  termination-per-pass / vertically-causal / predictable termination
  / segmentation symbols),
* LRCP or RLCP progression (identical packet order when there is a
  single layer, component and precinct).

Everything else is rejected loudly — silent misdecode of an
unsupported option would corrupt fields downstream.

Layers, bottom-up:

* :class:`MQEncoder` / :class:`MQDecoder` — the adaptive binary
  arithmetic coder of Annex C (flowcharts C.2-C.10; the shared Qe
  state-transition table is published constants).
* :class:`TagTree` — the quad-tree incremental coder of B.10.2 used
  for code-block inclusion and missing-MSB signalling.
* ``dwt2_forward`` / ``dwt2_inverse`` — the reversible 5/3 lifting
  transform of Annex F with whole-sample symmetric extension.
* ``_encode_codeblock`` / ``_decode_codeblock`` — EBCOT tier-1
  (Annex D): three coding passes per bit-plane over 4-row stripes
  with the standard 19-context model.
* ``j2k_encode`` / ``j2k_decode`` — markers, packet headers (tier-2,
  Annex B) and subband assembly.

There is no JPEG2000-capable library in this container, so (as with
the GeoTIFF/PNG codecs) conformance evidence is structural: encoder
and decoder are written from the two *separate* per-direction
flowcharts of the spec, sharing only published constant tables, and
the DWT is tested against a direct non-lifting evaluation of the 5/3
analysis filters computed independently in the test file.

Native-codec swap-in point: at 100 TB the per-record CPU constant of
this pure-Python tier-1/tier-2 path is the scaling cost, not the plan
shape — the decode runs entirely inside the landing source's
``mapInPandas`` stage (sources/grib_source.py::_decode_batches), so
that stage is the replaceable unit.  On a cluster with a native
JPEG2000 library (openjpeg/jasper/glymur), replace the
``j2k_decode(bytes) -> (samples, depth)`` call inside that stage
one-for-one; nothing upstream (binaryFile scan, record iteration,
header-side ``match=`` pushdown) or downstream (RECORD_SCHEMA rows,
cell explode) changes — the same contract the multimodal video stubs
document for their decode step.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------------------
# MQ coder (Annex C).  One row per state: (Qe, NMPS, NLPS, SWITCH) — the
# published probability-estimation table shared by JPEG2000 and JBIG2.
# --------------------------------------------------------------------------

_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# Tier-1 context numbering: 0-8 significance, 9-13 sign, 14-16 magnitude
# refinement, 17 run-length, 18 UNIFORM.
N_CTX = 19
CTX_RL = 17
CTX_UNI = 18
# Initial (state, MPS) per D.2: UNIFORM starts at 46, run-length at 3,
# significance context 0 at 4, everything else at 0; all MPS = 0.
_INIT_STATES = tuple(
    46 if c == CTX_UNI else 3 if c == CTX_RL else 4 if c == 0 else 0
    for c in range(N_CTX)
)


class MQEncoder:
    """Annex C.2 encoder (flowcharts C.2-C.9)."""

    def __init__(self) -> None:
        self.idx = list(_INIT_STATES)
        self.mps = [0] * N_CTX
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # One sentinel byte stands in for the spec's BP = BPST - 1
        # pre-buffer position; it is dropped (with any carry absorbed)
        # at flush.
        self.out = bytearray([0])

    def encode(self, d: int, cx: int) -> None:
        qe, nmps, nlps, switch = _QE[self.idx[cx]]
        if d == self.mps[cx]:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.idx[cx] = nmps
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] ^= 1
            self.idx[cx] = nlps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        out = self.out
        if out[-1] == 0xFF:
            out.append(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            out.append(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            out[-1] += 1
            self.c &= 0x7FFFFFF  # carry just moved into the previous byte
            if out[-1] == 0xFF:
                out.append(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                out.append(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        # SETBITS then two byte-outs (flowchart C.9).
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        data = self.out[1:]  # drop the BPST-1 sentinel
        # A codeword segment must not end in 0xFF (B.10.1); the decoder
        # synthesises 1-bits past the end, so the byte is redundant.
        while data and data[-1] == 0xFF:
            del data[-1]
        return bytes(data)


class MQDecoder:
    """Annex C.3 decoder (flowcharts C.10-C.16)."""

    def __init__(self, data: bytes) -> None:
        self.idx = list(_INIT_STATES)
        self.mps = [0] * N_CTX
        self.data = data
        self.bp = 0
        b = data[0] if data else 0xFF
        self.c = b << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        cur = data[bp] if bp < len(data) else 0xFF
        nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
        if cur == 0xFF:
            if nxt > 0x8F:
                self.c += 0xFF00  # past the end: feed 1-bits, stay put
                self.ct = 8
            else:
                self.bp += 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += nxt << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[self.idx[cx]]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange (C.13) + renorm
            if self.a < qe:
                d = self.mps[cx]
                self.idx[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                self.idx[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return self.mps[cx]
            # MPS exchange (C.12) + renorm
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                self.idx[cx] = nlps
            else:
                d = self.mps[cx]
                self.idx[cx] = nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d

# --------------------------------------------------------------------------
# Packet-header bit I/O (B.10.1).  Bits pack MSB-first; a byte equal to
# 0xFF is followed by a byte whose MSB is a stuffed 0, so no marker-
# lookalike (0xFF 0x9x..0xFx) pair can appear inside a packet header.
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0
        self._cap = 8

    def put(self, bit: int) -> None:
        self._acc = (self._acc << 1) | (bit & 1)
        self._n += 1
        if self._n == self._cap:
            self._emit()

    def put_bits(self, value: int, width: int) -> None:
        for k in range(width - 1, -1, -1):
            self.put((value >> k) & 1)

    def _emit(self) -> None:
        # cap 7 leaves the MSB clear — that IS the stuffed bit.
        self.out.append(self._acc)
        self._cap = 7 if self._acc == 0xFF else 8
        self._acc = 0
        self._n = 0

    def flush(self) -> bytes:
        if self._n:
            self._acc <<= self._cap - self._n
            self._emit()
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)  # terminal stuffing byte
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self._cur = 0
        self._left = 0

    def get(self) -> int:
        if self._left == 0:
            prev_ff = self._cur == 0xFF
            if self.pos >= len(self.data):
                raise ValueError("truncated packet header")
            self._cur = self.data[self.pos]
            self.pos += 1
            self._left = 7 if prev_ff else 8
        self._left -= 1
        return (self._cur >> self._left) & 1

    def get_bits(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.get()
        return v

    def align(self) -> None:
        """Discard the rest of the current byte; consume the stuffing
        byte if the last byte read was 0xFF (mirrors flush)."""
        self._left = 0
        if self._cur == 0xFF:
            self.pos += 1
        self._cur = 0


# --------------------------------------------------------------------------
# Tag trees (B.10.2): a quad-tree whose internal nodes hold the minimum
# of their children; leaf values are communicated incrementally against
# rising thresholds.  One instance per (precinct, subband) for code-block
# inclusion, another for missing-MSB counts.
# --------------------------------------------------------------------------

_UNSET = 1 << 30


class TagTree:
    def __init__(self, w: int, h: int) -> None:
        if w <= 0 or h <= 0:
            raise ValueError("tag tree needs a non-empty leaf grid")
        self.shape: list[tuple[int, int]] = []
        ww, hh = w, h
        while True:
            self.shape.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww = (ww + 1) // 2
            hh = (hh + 1) // 2
        self.value = [[_UNSET] * (sw * sh) for sw, sh in self.shape]
        self.bound = [[0] * (sw * sh) for sw, sh in self.shape]
        self.emitted = [[False] * (sw * sh) for sw, sh in self.shape]

    def set(self, x: int, y: int, v: int) -> None:
        w0 = self.shape[0][0]
        self.value[0][y * w0 + x] = v

    def finalize(self) -> None:
        """Encoder side: propagate child minima up the tree.  Must run
        after every leaf is set and before the first encode call."""
        for lvl in range(1, len(self.shape)):
            w, h = self.shape[lvl]
            cw, ch = self.shape[lvl - 1]
            for y in range(h):
                for x in range(w):
                    m = _UNSET
                    for cy in (2 * y, 2 * y + 1):
                        for cx in (2 * x, 2 * x + 1):
                            if cx < cw and cy < ch:
                                m = min(m, self.value[lvl - 1][cy * cw + cx])
                    self.value[lvl][y * w + x] = m

    def _path(self, x: int, y: int):
        """(level, index) pairs from the root down to leaf (x, y)."""
        for lvl in range(len(self.shape) - 1, -1, -1):
            w = self.shape[lvl][0]
            yield lvl, (y >> lvl) * w + (x >> lvl)

    def encode(self, bw: _BitWriter, x: int, y: int, threshold: int) -> None:
        bound = 0
        for lvl, idx in self._path(x, y):
            if self.bound[lvl][idx] < bound:
                self.bound[lvl][idx] = bound
            else:
                bound = self.bound[lvl][idx]
            while bound < threshold:
                if bound >= self.value[lvl][idx]:
                    if not self.emitted[lvl][idx]:
                        bw.put(1)
                        self.emitted[lvl][idx] = True
                    break
                bw.put(0)
                bound += 1
            self.bound[lvl][idx] = bound

    def decode(self, br: _BitReader, x: int, y: int, threshold: int) -> bool:
        """Consume bits until it is known whether leaf value < threshold."""
        bound = 0
        for lvl, idx in self._path(x, y):
            if self.bound[lvl][idx] < bound:
                self.bound[lvl][idx] = bound
            else:
                bound = self.bound[lvl][idx]
            while bound < threshold and bound < self.value[lvl][idx]:
                if br.get():
                    self.value[lvl][idx] = bound
                else:
                    bound += 1
            self.bound[lvl][idx] = bound
        lvl, idx = 0, y * self.shape[0][0] + x
        return self.value[lvl][idx] < threshold


# --------------------------------------------------------------------------
# Reversible 5/3 wavelet (Annex F).  Whole-sample symmetric extension;
# signals start at coordinate 0, so even positions are the low-pass
# phase.  All arithmetic is exact int64 lifting.
# --------------------------------------------------------------------------


def _fwd53_last_axis(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One 5/3 analysis split along the last axis: (low, high) with
    ceil(n/2) and floor(n/2) samples."""
    n = a.shape[-1]
    a = a.astype(np.int64, copy=False)
    if n == 1:
        return a.copy(), a[..., :0]
    even = a[..., 0::2]
    odd = a[..., 1::2]
    # right even neighbour of odd sample 2i+1; for even n the last odd
    # sample's neighbour is the symmetric extension a[n] = a[n-2].
    if n % 2 == 0:
        even_r = np.concatenate([even[..., 1:], even[..., -1:]], axis=-1)
    else:
        even_r = even[..., 1:]
    high = odd - (even[..., : odd.shape[-1]] + even_r) // 2
    h_left = np.concatenate([high[..., :1], high], axis=-1)[..., : even.shape[-1]]
    if n % 2 == 0:
        h_right = high
    else:  # last even sample's right high neighbour mirrors back
        h_right = np.concatenate([high, high[..., -1:]], axis=-1)
    low = even + (h_left + h_right + 2) // 4
    return low, high


def _inv53_last_axis(low: np.ndarray, high: np.ndarray, n: int) -> np.ndarray:
    """Exact inverse of :func:`_fwd53_last_axis`."""
    if n == 1:
        return low.copy()
    low = low.astype(np.int64, copy=False)
    high = high.astype(np.int64, copy=False)
    h_left = np.concatenate([high[..., :1], high], axis=-1)[..., : low.shape[-1]]
    if n % 2 == 0:
        h_right = high
    else:
        h_right = np.concatenate([high, high[..., -1:]], axis=-1)
    even = low - (h_left + h_right + 2) // 4
    if n % 2 == 0:
        even_r = np.concatenate([even[..., 1:], even[..., -1:]], axis=-1)
    else:
        even_r = even[..., 1:]
    odd = high + (even[..., : high.shape[-1]] + even_r) // 2
    out = np.empty(low.shape[:-1] + (n,), dtype=np.int64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _split_once(a: np.ndarray):
    """One 2-D decomposition: horizontal split then vertical split,
    yielding (LL, HL, LH, HH) where HL is horizontally high-pass."""
    lo, hi = _fwd53_last_axis(a)
    ll, lh = (x.swapaxes(0, 1) for x in _fwd53_last_axis(lo.swapaxes(0, 1)))
    hl, hh = (x.swapaxes(0, 1) for x in _fwd53_last_axis(hi.swapaxes(0, 1)))
    return ll, hl, lh, hh


def _join_once(ll, hl, lh, hh, h: int, w: int) -> np.ndarray:
    lo = _inv53_last_axis(ll.swapaxes(0, 1), lh.swapaxes(0, 1), h).swapaxes(0, 1)
    hi = _inv53_last_axis(hl.swapaxes(0, 1), hh.swapaxes(0, 1), h).swapaxes(0, 1)
    return _inv53_last_axis(lo, hi, w)


def dwt2_forward(a: np.ndarray, levels: int):
    """``levels`` 2-D decompositions.  Returns ``(ll, detail)`` where
    ``detail[r-1]`` holds resolution r's ``(HL, LH, HH)`` (r = 1 is the
    coarsest detail, matching codestream packet order)."""
    ll = a.astype(np.int64, copy=False)
    stack = []
    for _ in range(levels):
        ll, hl, lh, hh = _split_once(ll)
        stack.append((hl, lh, hh))
    return ll, stack[::-1]


def dwt2_inverse(ll: np.ndarray, detail, shape: tuple[int, int]) -> np.ndarray:
    """Inverse of :func:`dwt2_forward` toward full-resolution ``shape``."""
    h, w = shape
    levels = len(detail)
    # reconstruct target dims per level from the top down
    dims = [(h, w)]
    for _ in range(levels):
        hh_, ww_ = dims[-1]
        dims.append(((hh_ + 1) // 2, (ww_ + 1) // 2))
    for r in range(1, levels + 1):
        hl, lh, hh = detail[r - 1]
        th, tw = dims[levels - r]
        ll = _join_once(ll, hl, lh, hh, th, tw)
    return ll


# --------------------------------------------------------------------------
# EBCOT tier-1 (Annex D).  Code-blocks are coded in 4-row stripes,
# column-major within a stripe, three passes per bit-plane
# (significance propagation, magnitude refinement, cleanup; the first
# plane has cleanup only).  Neighbours outside the code-block are
# treated as insignificant.  One MQ codeword segment spans all passes
# (default code-block style).
# --------------------------------------------------------------------------


def _sig_tables():
    """Significance context LUTs, Table D.1.  ``lowpass[h][v][d]`` serves
    LL and LH; HL is the same with h/v swapped; ``diag[d][hv]`` serves
    HH."""
    lowpass = [[[0] * 5 for _ in range(3)] for _ in range(3)]
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                else:
                    c = 2 if d >= 2 else d
                lowpass[h][v][d] = c
    diag = [[0] * 5 for _ in range(5)]
    for d in range(5):
        for hv in range(5):
            if d >= 3:
                c = 8
            elif d == 2:
                c = 7 if hv >= 1 else 6
            elif d == 1:
                c = 5 if hv >= 2 else (4 if hv == 1 else 3)
            else:
                c = 2 if hv >= 2 else hv
            diag[d][hv] = c
    return lowpass, diag


_SIG_LOWPASS, _SIG_DIAG = _sig_tables()

# Sign-coding contexts and XOR bits, Table D.3, keyed by the clamped
# horizontal / vertical sign contributions.
_SIGN_CTX = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _BlockState:
    """Shared coefficient-state bookkeeping for one code-block.

    ``sig`` / ``neg`` are padded by one cell on every side so neighbour
    reads never bounds-check (the pad rim stays insignificant, which is
    exactly the D.3.1 rule for out-of-block neighbours)."""

    __slots__ = ("h", "w", "band", "sig", "neg", "visited", "refined")

    def __init__(self, h: int, w: int, band: str) -> None:
        self.h, self.w, self.band = h, w, band
        self.sig = np.zeros((h + 2, w + 2), dtype=bool)
        self.neg = np.zeros((h + 2, w + 2), dtype=bool)
        self.visited = np.zeros((h + 2, w + 2), dtype=bool)
        self.refined = np.zeros((h, w), dtype=bool)

    def sig_ctx(self, r: int, c: int) -> int:
        s = self.sig
        hn = int(s[r + 1, c]) + int(s[r + 1, c + 2])
        vn = int(s[r, c + 1]) + int(s[r + 2, c + 1])
        dn = (
            int(s[r, c]) + int(s[r, c + 2])
            + int(s[r + 2, c]) + int(s[r + 2, c + 2])
        )
        band = self.band
        if band == "HL":
            return _SIG_LOWPASS[vn][hn][dn]
        if band == "HH":
            return _SIG_DIAG[dn][min(hn + vn, 4)]
        return _SIG_LOWPASS[hn][vn][dn]

    def sign_ctx(self, r: int, c: int) -> tuple[int, int]:
        s, g = self.sig, self.neg

        def contrib(rr: int, cc: int) -> int:
            if not s[rr, cc]:
                return 0
            return -1 if g[rr, cc] else 1

        hc = max(-1, min(1, contrib(r + 1, c) + contrib(r + 1, c + 2)))
        vc = max(-1, min(1, contrib(r, c + 1) + contrib(r + 2, c + 1)))
        return _SIGN_CTX[(hc, vc)]

    def scan(self):
        for s0 in range(0, self.h, 4):
            for c in range(self.w):
                for r in range(s0, min(s0 + 4, self.h)):
                    yield r, c

    def stripe_cols(self):
        for s0 in range(0, self.h, 4):
            for c in range(self.w):
                yield s0, c


def _encode_codeblock(coeffs: np.ndarray, band: str) -> tuple[bytes, int, int]:
    """Tier-1 encode one code-block of signed integer coefficients.
    Returns ``(codeword segment, magnitude bit-planes K, pass count)``;
    an all-zero block returns ``(b"", 0, 0)`` (not included in any
    packet)."""
    h, w = coeffs.shape
    mag = np.abs(coeffs.astype(np.int64))
    k = int(mag.max()).bit_length() if mag.size else 0
    if k == 0:
        return b"", 0, 0
    negative = coeffs < 0
    st = _BlockState(h, w, band)
    enc = MQEncoder()

    def code_sign(r: int, c: int) -> None:
        ctx, xor = st.sign_ctx(r, c)
        bit = int(negative[r, c])
        enc.encode(bit ^ xor, ctx)
        st.sig[r + 1, c + 1] = True
        st.neg[r + 1, c + 1] = bit

    for p in range(k - 1, -1, -1):
        if p != k - 1:
            # significance propagation
            for r, c in st.scan():
                if st.sig[r + 1, c + 1]:
                    continue
                ctx = st.sig_ctx(r, c)
                if ctx == 0:
                    continue
                bit = int(mag[r, c] >> p) & 1
                enc.encode(bit, ctx)
                st.visited[r + 1, c + 1] = True
                if bit:
                    code_sign(r, c)
            # magnitude refinement
            for r, c in st.scan():
                if not st.sig[r + 1, c + 1] or st.visited[r + 1, c + 1]:
                    continue
                if st.refined[r, c]:
                    ctx = 16
                else:
                    ctx = 15 if st.sig_ctx(r, c) != 0 else 14
                enc.encode(int(mag[r, c] >> p) & 1, ctx)
                st.refined[r, c] = True
        # cleanup
        for s0, c in st.stripe_cols():
            rows = range(s0, min(s0 + 4, h))
            run = len(rows) == 4 and all(
                not st.sig[r + 1, c + 1]
                and not st.visited[r + 1, c + 1]
                and st.sig_ctx(r, c) == 0
                for r in rows
            )
            start = s0
            if run:
                bits = [(int(mag[r, c]) >> p) & 1 for r in rows]
                if not any(bits):
                    enc.encode(0, CTX_RL)
                    continue
                enc.encode(1, CTX_RL)
                r0 = bits.index(1)
                enc.encode(r0 >> 1, CTX_UNI)
                enc.encode(r0 & 1, CTX_UNI)
                code_sign(s0 + r0, c)
                start = s0 + r0 + 1
            for r in range(start, rows.stop):
                if st.sig[r + 1, c + 1] or st.visited[r + 1, c + 1]:
                    continue
                ctx = st.sig_ctx(r, c)
                bit = int(mag[r, c] >> p) & 1
                enc.encode(bit, ctx)
                if bit:
                    code_sign(r, c)
        st.visited[:] = False
    return enc.flush(), k, 3 * k - 2


def _decode_codeblock(
    data: bytes, h: int, w: int, k: int, npasses: int, band: str
) -> np.ndarray:
    """Tier-1 decode mirror of :func:`_encode_codeblock`."""
    mag = np.zeros((h, w), dtype=np.int64)
    if k == 0 or npasses == 0:
        return mag
    st = _BlockState(h, w, band)
    dec = MQDecoder(data)
    negative = np.zeros((h, w), dtype=bool)

    def decode_sign(r: int, c: int, p: int) -> None:
        ctx, xor = st.sign_ctx(r, c)
        bit = dec.decode(ctx) ^ xor
        negative[r, c] = bool(bit)
        mag[r, c] = 1 << p
        st.sig[r + 1, c + 1] = True
        st.neg[r + 1, c + 1] = bool(bit)

    done = 0
    for p in range(k - 1, -1, -1):
        if p != k - 1:
            if done >= npasses:
                break
            for r, c in st.scan():  # significance propagation
                if st.sig[r + 1, c + 1]:
                    continue
                ctx = st.sig_ctx(r, c)
                if ctx == 0:
                    continue
                st.visited[r + 1, c + 1] = True
                if dec.decode(ctx):
                    decode_sign(r, c, p)
            done += 1
            if done >= npasses:
                break
            for r, c in st.scan():  # magnitude refinement
                if not st.sig[r + 1, c + 1] or st.visited[r + 1, c + 1]:
                    continue
                if st.refined[r, c]:
                    ctx = 16
                else:
                    ctx = 15 if st.sig_ctx(r, c) != 0 else 14
                if dec.decode(ctx):
                    mag[r, c] |= 1 << p
                st.refined[r, c] = True
            done += 1
        if done >= npasses:
            break
        for s0, c in st.stripe_cols():  # cleanup
            rows = range(s0, min(s0 + 4, h))
            run = len(rows) == 4 and all(
                not st.sig[r + 1, c + 1]
                and not st.visited[r + 1, c + 1]
                and st.sig_ctx(r, c) == 0
                for r in rows
            )
            start = s0
            if run:
                if not dec.decode(CTX_RL):
                    continue
                r0 = (dec.decode(CTX_UNI) << 1) | dec.decode(CTX_UNI)
                decode_sign(s0 + r0, c, p)
                start = s0 + r0 + 1
            for r in range(start, rows.stop):
                if st.sig[r + 1, c + 1] or st.visited[r + 1, c + 1]:
                    continue
                if dec.decode(st.sig_ctx(r, c)):
                    decode_sign(r, c, p)
        done += 1
        st.visited[:] = False
    out = mag.copy()
    out[negative] = -out[negative]
    return out


# --------------------------------------------------------------------------
# Tier-2: code-block partition, packet headers (B.9/B.10) and the
# codestream markers (Annex A).
# --------------------------------------------------------------------------

_SOC, _SIZ, _COD, _QCD, _COM = 0xFF4F, 0xFF51, 0xFF52, 0xFF5C, 0xFF64
_SOT, _SOD, _EOC = 0xFF90, 0xFF93, 0xFFD9
_CB = 64  # code-block side (2^(4+2))
_GUARD = 2
_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
_MAX_DIM = 1 << 15  # one maximal precinct per resolution


def _band_layout(h: int, w: int, levels: int):
    """Per-resolution subband names and shapes.  Resolution 0 is the
    deepest LL; resolution r >= 1 carries (HL, LH, HH) of decomposition
    level ``levels - r + 1``."""
    hs = [h]
    ws = [w]
    for _ in range(levels):
        hs.append((hs[-1] + 1) // 2)
        ws.append((ws[-1] + 1) // 2)
    out = [[("LL", hs[levels], ws[levels])]]
    for r in range(1, levels + 1):
        lvl = levels - r + 1
        lo_h, hi_h = hs[lvl], hs[lvl - 1] - hs[lvl]
        lo_w, hi_w = ws[lvl], ws[lvl - 1] - ws[lvl]
        out.append(
            [("HL", lo_h, hi_w), ("LH", hi_h, lo_w), ("HH", hi_h, hi_w)]
        )
    return out


def _blocks_of(bh: int, bw_: int):
    """Raster-order code-block rectangles of a subband (row0, row1,
    col0, col1); empty subbands yield nothing."""
    for by in range((bh + _CB - 1) // _CB):
        for bx in range((bw_ + _CB - 1) // _CB):
            yield (
                bx,
                by,
                by * _CB,
                min((by + 1) * _CB, bh),
                bx * _CB,
                min((bx + 1) * _CB, bw_),
            )


def _put_npasses(bw: _BitWriter, n: int) -> None:
    """Coding-pass count, Table B.4."""
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put_bits(0b10, 2)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b1111, 4)
        bw.put_bits(n - 6, 5)
    elif n <= 164:
        bw.put_bits(0b111111111, 9)
        bw.put_bits(n - 37, 7)
    else:
        raise ValueError(f"cannot signal {n} coding passes")


def _get_npasses(br: _BitReader) -> int:
    if not br.get():
        return 1
    if not br.get():
        return 2
    v = br.get_bits(2)
    if v != 0b11:
        return 3 + v
    v = br.get_bits(5)
    if v != 0b11111:
        return 6 + v
    return 37 + br.get_bits(7)


def j2k_encode(arr: np.ndarray, depth: int, levels: int | None = None) -> bytes:
    """Encode a 2-D unsigned integer array losslessly as a raw JPEG2000
    codestream (SOC..EOC, no JP2 container) — the exact shape g2clib
    emits into a GRIB2 template-7.40 data section."""
    if arr.ndim != 2:
        raise ValueError("j2k_encode takes a 2-D array")
    h, w = arr.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if h > _MAX_DIM or w > _MAX_DIM:
        raise ValueError(
            f"{w}x{h} exceeds the single-precinct limit {_MAX_DIM}"
        )
    if not 1 <= depth <= 29:
        # QCD carries a 5-bit reversible exponent per subband and the
        # HH gain is 2, so depth + 2 must stay <= 31.
        raise ValueError(f"unsupported bit depth {depth} (1..29)")
    a = np.ascontiguousarray(arr, dtype=np.int64)
    if a.min() < 0 or (depth < 63 and a.max() >> depth):
        raise ValueError(f"samples exceed unsigned {depth}-bit range")
    if levels is None:
        levels = max(0, min(5, min(h, w).bit_length() - 1))
    a = a - (1 << (depth - 1))  # DC level shift for unsigned input

    ll, detail = dwt2_forward(a, levels)
    arrays = {(0, "LL"): ll}
    for r in range(1, levels + 1):
        hl, lh, hh = detail[r - 1]
        arrays[(r, "HL")], arrays[(r, "LH")], arrays[(r, "HH")] = hl, lh, hh
    layout = _band_layout(h, w, levels)

    packets = bytearray()
    for r, bands in enumerate(layout):
        entries = []  # (band order, per-block tier-1 results)
        for name, bh, bw_ in bands:
            sub = arrays[(r, name)]
            mb = depth + _GAIN[name] + _GUARD - 1
            nbx = (bw_ + _CB - 1) // _CB
            nby = (bh + _CB - 1) // _CB
            if nbx == 0 or nby == 0:
                entries.append((name, None, None, []))
                continue
            incl, msbt = TagTree(nbx, nby), TagTree(nbx, nby)
            blocks = []
            for bx, by, r0, r1, c0, c1 in _blocks_of(bh, bw_):
                data, k, npasses = _encode_codeblock(sub[r0:r1, c0:c1], name)
                if k > mb:
                    raise AssertionError(
                        f"{name} magnitude needs {k} planes > Mb {mb}"
                    )
                incl.set(bx, by, 0 if npasses else 1)
                msbt.set(bx, by, mb - k)
                blocks.append((bx, by, data, k, npasses))
            incl.finalize()
            msbt.finalize()
            entries.append((name, incl, msbt, blocks))
        hdr = _BitWriter()
        body = bytearray()
        if not any(np_ for _, _, _, blks in entries for *_x, np_ in blks):
            hdr.put(0)  # empty packet
        else:
            hdr.put(1)
            for name, incl, msbt, blocks in entries:
                lblock = {}
                for bx, by, data, k, npasses in blocks:
                    incl.encode(hdr, bx, by, 1)
                    if not npasses:
                        continue
                    msbt.encode(hdr, bx, by, msbt.value[0][
                        by * msbt.shape[0][0] + bx] + 1)
                    _put_npasses(hdr, npasses)
                    lb = lblock.get((bx, by), 3)
                    nbits = lb + (npasses.bit_length() - 1)
                    grow = max(0, len(data).bit_length() - nbits)
                    for _ in range(grow):
                        hdr.put(1)
                    hdr.put(0)
                    lblock[(bx, by)] = lb + grow
                    hdr.put_bits(len(data), nbits + grow)
                    body += data
        packets += hdr.flush() + bytes(body)

    siz = struct.pack(
        ">HHHIIIIIIIIHBBB",
        _SIZ, 41, 0, w, h, 0, 0, w, h, 0, 0, 1, depth - 1, 1, 1,
    )
    cod = struct.pack(
        ">HHBBHBBBBBB", _COD, 12, 0, 0, 1, 0, levels, _CB.bit_length() - 7,
        _CB.bit_length() - 7, 0, 1,
    )
    n_sb = 3 * levels + 1
    exps = bytes(
        (depth + _GAIN[name]) << 3
        for bands in layout
        for name, _bh, _bw in bands
    )
    qcd = struct.pack(">HHB", _QCD, 3 + n_sb, _GUARD << 5) + exps
    tile_len = 12 + 2 + len(packets)  # SOT..SOD..packets
    sot = struct.pack(">HHHIBB", _SOT, 10, 0, tile_len, 0, 1)
    return (
        struct.pack(">H", _SOC)
        + siz
        + cod
        + qcd
        + sot
        + struct.pack(">H", _SOD)
        + bytes(packets)
        + struct.pack(">H", _EOC)
    )


def j2k_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a raw JPEG2000 codestream produced within the profile in
    the module docstring.  Returns ``(values, bit depth)``; every
    unsupported option raises (silent misdecode would corrupt grids)."""
    if len(buf) < 4 or struct.unpack_from(">H", buf, 0)[0] != _SOC:
        raise ValueError("not a JPEG2000 codestream (missing SOC)")
    pos = 2
    dims = None
    cod = None
    exps = None
    guard = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("truncated codestream (no SOT)")
        (marker,) = struct.unpack_from(">H", buf, pos)
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4 : pos + 2 + ln]
        if marker == _SIZ:
            rsiz, xs, ys, xo, yo, xt, yt, xto, yto, csiz = struct.unpack_from(
                ">HIIIIIIIIH", seg, 0
            )
            if csiz != 1:
                raise ValueError(f"{csiz} components (only 1 supported)")
            if (xo, yo, xto, yto) != (0, 0, 0, 0) or xt < xs or yt < ys:
                raise ValueError("tiled or offset images not supported")
            ssiz, xr, yr = seg[36], seg[37], seg[38]
            if ssiz & 0x80:
                raise ValueError("signed components not supported")
            if (xr, yr) != (1, 1):
                raise ValueError("subsampled components not supported")
            if xs > _MAX_DIM or ys > _MAX_DIM:
                # beyond 2^15 the default precinct grid splits each
                # resolution into multiple packets; reading it as one
                # packet would desync tier-2 and corrupt silently.
                raise ValueError(
                    f"{xs}x{ys} exceeds the single-precinct limit {_MAX_DIM}"
                )
            dims = (ys, xs, ssiz + 1)
        elif marker == _COD:
            scod, prog, nlayers, mct = seg[0], seg[1], struct.unpack_from(
                ">H", seg, 2
            )[0], seg[4]
            nl, xcb2, ycb2, style, xform = seg[5], seg[6], seg[7], seg[8], seg[9]
            if scod != 0:
                raise ValueError("precinct/SOP/EPH coding options not supported")
            if prog not in (0, 1) or nlayers != 1 or mct != 0:
                raise ValueError("multi-layer or reordered progressions not supported")
            if (xcb2, ycb2) != (_CB.bit_length() - 7, _CB.bit_length() - 7):
                raise ValueError("only 64x64 code-blocks supported")
            if style != 0:
                raise ValueError(f"code-block style 0x{style:02x} not supported")
            if xform != 1:
                raise ValueError("irreversible (9/7) transform not supported")
            cod = nl
        elif marker == _QCD:
            if seg[0] & 0x1F:
                raise ValueError("quantized (non-reversible) codestream")
            guard = seg[0] >> 5
            exps = [b >> 3 for b in seg[1:]]
        elif marker == _COM:
            pass
        elif marker == _SOT:
            break
        else:
            raise ValueError(f"unsupported marker 0x{marker:04x}")
        pos += 2 + ln
    if dims is None or cod is None or exps is None:
        raise ValueError("missing SIZ/COD/QCD before tile data")
    h, w, depth = dims
    levels = cod
    layout = _band_layout(h, w, levels)
    if len(exps) != 3 * levels + 1:
        raise ValueError("QCD subband count does not match COD levels")
    isot, psot, tpsot, tnsot = struct.unpack_from(">HIBB", buf, pos + 4)
    if isot != 0 or tpsot != 0 or tnsot != 1:
        raise ValueError("multi-tile-part codestreams not supported")
    pos += 12
    if struct.unpack_from(">H", buf, pos)[0] != _SOD:
        raise ValueError("expected SOD after SOT")
    pos += 2

    arrays = {}
    exp_iter = iter(exps)
    band_mb = {}
    for r, bands in enumerate(layout):
        for name, _bh, _bw in bands:
            band_mb[(r, name)] = next(exp_iter) + guard - 1
    for r, bands in enumerate(layout):
        br = _BitReader(buf, pos)
        contribs = []
        if br.get():  # non-empty packet
            for name, bh, bw_ in bands:
                nbx = (bw_ + _CB - 1) // _CB
                nby = (bh + _CB - 1) // _CB
                if nbx == 0 or nby == 0:
                    continue
                incl, msbt = TagTree(nbx, nby), TagTree(nbx, nby)
                lblock = {}
                for bx, by, r0, r1, c0, c1 in _blocks_of(bh, bw_):
                    if not incl.decode(br, bx, by, 1):
                        continue
                    p = 1
                    while not msbt.decode(br, bx, by, p):
                        p += 1
                    missing = p - 1
                    k = band_mb[(r, name)] - missing
                    if k < 0:
                        raise ValueError("missing MSBs exceed Mb")
                    npasses = _get_npasses(br)
                    lb = lblock.get((bx, by), 3)
                    while br.get():
                        lb += 1
                    lblock[(bx, by)] = lb
                    seg_len = br.get_bits(lb + npasses.bit_length() - 1)
                    contribs.append(
                        (name, r0, r1, c0, c1, k, npasses, seg_len)
                    )
        br.align()
        pos = br.pos
        for name, bh, bw_ in bands:
            arrays[(r, name)] = np.zeros((bh, bw_), dtype=np.int64)
        for name, r0, r1, c0, c1, k, npasses, seg_len in contribs:
            data = bytes(buf[pos : pos + seg_len])
            if len(data) != seg_len:
                raise ValueError("truncated code-block segment")
            pos += seg_len
            arrays[(r, name)][r0:r1, c0:c1] = _decode_codeblock(
                data, r1 - r0, c1 - c0, k, npasses, name
            )
    if struct.unpack_from(">H", buf, pos)[0] != _EOC:
        raise ValueError("expected EOC after the last packet")
    detail = [
        (arrays[(r, "HL")], arrays[(r, "LH")], arrays[(r, "HH")])
        for r in range(1, levels + 1)
    ]
    out = dwt2_inverse(arrays[(0, "LL")], detail, (h, w))
    out += 1 << (depth - 1)
    return out, depth
