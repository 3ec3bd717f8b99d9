"""JPEG decode/encode — native C++ (libjpeg) codec bound via ctypes.

Replaces the reference's vendored CImg header (used only for JPEG IO,
`/root/reference/heterogeneous_blur.c:19-20,106-137`) with a purpose-built
native codec (`hipe_tpu/csrc/jpeg_codec.cpp`): decode straight to interleaved
HWC uint8, batched multithreaded decode for the streaming pipeline, and
in-memory encode. Builds the shared library on first use; falls back to PIL
if the native build is unavailable.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_SO_PATH = os.path.abspath(os.path.join(_CSRC, "libhipejpeg.so"))
_SRC_PATH = os.path.abspath(os.path.join(_CSRC, "jpeg_codec.cpp"))

_lib = None
_lib_lock = threading.Lock()
_native_failed = False


def _build_native() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH,
        "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> ctypes.CDLL | None:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _native_failed
    if _lib is not None or _native_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _native_failed:
            return _lib
        if not os.path.exists(_SO_PATH) or os.path.getmtime(
            _SO_PATH
        ) < os.path.getmtime(_SRC_PATH):
            if not _build_native():
                _native_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _native_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.hipe_jpeg_dims.argtypes = [
            u8p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.hipe_jpeg_dims.restype = ctypes.c_int
        lib.hipe_jpeg_decode.argtypes = [
            u8p, ctypes.c_size_t, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.hipe_jpeg_decode.restype = ctypes.c_int
        lib.hipe_jpeg_encode.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.hipe_jpeg_encode.restype = ctypes.c_int
        lib.hipe_jpeg_decode_batch.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.hipe_jpeg_decode_batch.restype = ctypes.c_int
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.hipe_jpeg_coef_info.argtypes = [
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
        ]
        lib.hipe_jpeg_coef_info.restype = ctypes.c_int
        lib.hipe_jpeg_read_coefs.argtypes = [
            u8p, ctypes.c_size_t, ctypes.POINTER(i16p),
            ctypes.POINTER(ctypes.c_uint16),
        ]
        lib.hipe_jpeg_read_coefs.restype = ctypes.c_int
        lib.hipe_jpeg_encode_opts.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.hipe_jpeg_encode_opts.restype = ctypes.c_int
        lib.hipe_jpeg_encode_cmyk.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.hipe_jpeg_encode_cmyk.restype = ctypes.c_int
        lib.hipe_jpeg_write_coefs.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint16),
            u8p, ctypes.c_size_t,
            ctypes.POINTER(i16p),
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.hipe_jpeg_write_coefs.restype = ctypes.c_int
        lib.hipe_jpeg_read_markers.argtypes = [
            u8p, ctypes.c_size_t,
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.hipe_jpeg_read_markers.restype = ctypes.c_int
        lib.hipe_jpeg_quality_tables.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint16),
        ]
        lib.hipe_jpeg_quality_tables.restype = ctypes.c_int
        lib.hipe_jpeg_coef_info_batch.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.hipe_jpeg_coef_info_batch.restype = ctypes.c_int
        lib.hipe_jpeg_read_coefs_batch.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.POINTER(i16p), ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.hipe_jpeg_read_coefs_batch.restype = ctypes.c_int
        lib.hipe_jpeg_write_coefs_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(i16p), ctypes.c_int,
            u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.hipe_jpeg_write_coefs_batch.restype = ctypes.c_int
        lib.hipe_jpeg_scaled_dims.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.hipe_jpeg_scaled_dims.restype = ctypes.c_int
        lib.hipe_jpeg_decode_scaled.argtypes = [
            u8p, ctypes.c_size_t, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.hipe_jpeg_decode_scaled.restype = ctypes.c_int
        lib.hipe_jpeg_scaled_info.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.hipe_jpeg_scaled_info.restype = ctypes.c_int
        lib.hipe_jpeg_decode_scaled_batch.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.hipe_jpeg_decode_scaled_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def decode_bytes(data: bytes, force_gray: bool = False) -> np.ndarray:
    """Decode a JPEG byte string to HWC uint8.

    Interleaved RGB (C=3), grayscale (C=1), or — for 4-component Adobe
    streams — CMYK samples exactly as libjpeg emits them (C=4; YCCK gets
    the library's Adobe transform). ``force_gray=True`` decodes color
    streams with out_color_space=JCS_GRAYSCALE (Y-only IDCT, chroma
    never touched — libjpeg's fast gray path); 4-component streams have
    no gray conversion and raise.
    """
    lib = _load()
    if lib is None:
        out = _pil_decode(data)
        if force_gray and out.shape[-1] == 3:
            raise RuntimeError("force_gray needs the native codec")
        return out
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.hipe_jpeg_dims(_as_u8p(buf), buf.size, w, h, c) != 0:
        raise ValueError("invalid JPEG header")
    if force_gray:
        if c.value == 4:
            raise ValueError("4-component (CMYK) streams have no "
                             "grayscale conversion in libjpeg")
        c.value = 1
    out = np.empty((h.value, w.value, c.value), dtype=np.uint8)
    rc = lib.hipe_jpeg_decode(_as_u8p(buf), buf.size, _as_u8p(out),
                              w.value, h.value, c.value)
    if rc != 0:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out


def decode_file(path: str) -> np.ndarray:
    """Load an image file to HWC uint8.

    JPEG content (SOI-marked) goes through the native codec; anything
    else (BMP / PNG / PPM / ... — the formats the reference's CImg
    loader dispatches on by extension, /root/reference/CImg/CImg.h
    `load()`) decodes via PIL. Content sniffing, not extension, decides:
    a mislabeled .jpg still takes the right path.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"\xff\xd8":
        return _pil_decode(data)
    return decode_bytes(data)


def scaled_dims(data: bytes, scale_num: int, scale_denom: int) -> tuple[int, int, int]:
    """Output (H, W, C) of a libjpeg scaled decode at scale_num/scale_denom.

    libjpeg normalizes the ratio to M/8 with M in 1..16; the output dims are
    ceil(dim * M / 8) (`jpeg_calc_output_dimensions`).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable: scaled decode requires libjpeg")
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.hipe_jpeg_scaled_dims(_as_u8p(buf), buf.size, scale_num, scale_denom,
                                   w, h, c)
    if rc != 0:
        raise ValueError("invalid JPEG header")
    return h.value, w.value, c.value


def scaled_info(data: bytes, scale_num: int, scale_denom: int):
    """libjpeg's scaled-decode geometry decisions (probe, no decode).

    Returns ((out_w, out_h), [(dct_scaled_size, down_w, down_h), ...]) — the
    per-component scaled DCT size the library selects (jdmaster.c) and each
    component's downsampled output dims. Ground truth for
    `ops/jpeg_decode.scaled_sizes`.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable: scaled decode requires libjpeg")
    buf = np.frombuffer(data, dtype=np.uint8)
    info = (ctypes.c_int * 18)()
    rc = lib.hipe_jpeg_scaled_info(_as_u8p(buf), buf.size, scale_num,
                                   scale_denom, info)
    if rc != 0:
        raise ValueError(f"JPEG scaled-info probe failed (rc={rc})")
    # The C side writes one 4-int record per header component; the ctypes
    # array is zero-initialized, and DCT_scaled_size is always >= 1, so a
    # zero record marks the end.
    comps = []
    for i in range(4):
        rec = info[2 + 4 * i : 2 + 4 * (i + 1)]
        if rec[0] == 0:
            break
        comps.append((rec[0], rec[1], rec[2]))
    return (info[0], info[1]), comps


def decode_bytes_scaled(data: bytes, scale_num: int, scale_denom: int,
                        force_gray: bool = False) -> np.ndarray:
    """Decode at scale_num/scale_denom via libjpeg DCT-domain scaling.

    The host fallback for thumbnail serving and the golden oracle for the
    device reduced-IDCT decode (`ops/jpeg_decode.decode_planes_scaled`).
    ``force_gray`` composes with scaling exactly as in `decode_bytes`.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable: scaled decode requires libjpeg")
    h, w, c = scaled_dims(data, scale_num, scale_denom)
    if force_gray:
        if c == 4:
            raise ValueError("4-component (CMYK) streams have no "
                             "grayscale conversion in libjpeg")
        c = 1
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((h, w, c), dtype=np.uint8)
    rc = lib.hipe_jpeg_decode_scaled(_as_u8p(buf), buf.size, _as_u8p(out),
                                     w, h, c, scale_num, scale_denom)
    if rc != 0:
        raise ValueError(f"scaled JPEG decode failed (rc={rc})")
    return out


def decode_batch(datas: list[bytes], num_threads: int | None = None,
                 force_gray: bool = False) -> np.ndarray:
    """Decode same-shaped JPEGs concurrently into one (B, H, W, C) batch."""
    if not datas:
        raise ValueError("empty batch")
    lib = _load()
    if lib is None:
        if force_gray:
            raise RuntimeError("force_gray needs the native codec")
        return np.stack([_pil_decode(d) for d in datas])
    first = decode_bytes(datas[0], force_gray=force_gray)
    h, w, c = first.shape
    out = np.empty((len(datas), h, w, c), dtype=np.uint8)
    out[0] = first
    if len(datas) > 1:
        bufs = [np.frombuffer(d, dtype=np.uint8) for d in datas[1:]]
        arr_t = ctypes.POINTER(ctypes.c_ubyte) * len(bufs)
        ptrs = arr_t(*[_as_u8p(b) for b in bufs])
        lens = (ctypes.c_size_t * len(bufs))(*[b.size for b in bufs])
        nt = num_threads or min(os.cpu_count() or 1, len(bufs))
        fails = lib.hipe_jpeg_decode_batch(
            ptrs, lens, len(bufs), _as_u8p(out[1:]), w, h, c, nt
        )
        if fails:
            raise ValueError(f"{fails} images failed to decode")
    return out


def decode_batch_scaled(datas: list[bytes], scale_num: int, scale_denom: int,
                        num_threads: int | None = None,
                        force_gray: bool = False) -> np.ndarray:
    """Scaled decode of same-shaped JPEGs into one (B, H, W, C) batch.

    The GIL-free pthread batch path of `decode_bytes_scaled` — the host
    stage for thumbnail serving (runtime/serve.py decode_scale) when the
    device scaled decoder does not apply.
    """
    if not datas:
        raise ValueError("empty batch")
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable: scaled decode requires libjpeg")
    first = decode_bytes_scaled(datas[0], scale_num, scale_denom,
                                force_gray=force_gray)
    h, w, c = first.shape
    out = np.empty((len(datas), h, w, c), dtype=np.uint8)
    out[0] = first
    if len(datas) > 1:
        bufs = [np.frombuffer(d, dtype=np.uint8) for d in datas[1:]]
        arr_t = ctypes.POINTER(ctypes.c_ubyte) * len(bufs)
        ptrs = arr_t(*[_as_u8p(b) for b in bufs])
        lens = (ctypes.c_size_t * len(bufs))(*[b.size for b in bufs])
        nt = num_threads or min(os.cpu_count() or 1, len(bufs))
        fails = lib.hipe_jpeg_decode_scaled_batch(
            ptrs, lens, len(bufs), _as_u8p(out[1:]), w, h, c,
            scale_num, scale_denom, nt
        )
        if fails:
            raise ValueError(f"{fails} images failed to decode")
    return out


def _run_encode(call, cap0: int) -> bytes:
    """Run a native encode call; on rc=3 (didn't fit) retry at the exact
    required size the C side reports in out_len."""
    out = np.empty(cap0, dtype=np.uint8)
    out_len = ctypes.c_size_t()
    rc = call(_as_u8p(out), ctypes.c_size_t(cap0), out_len)
    if rc == 3:
        out = np.empty(out_len.value, dtype=np.uint8)
        rc = call(_as_u8p(out), ctypes.c_size_t(out.size), out_len)
    if rc != 0:
        raise ValueError(f"JPEG encode failed (rc={rc})")
    return out[: out_len.value].tobytes()


def encode_bytes(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode HWC uint8 to JPEG bytes."""
    assert img.dtype == np.uint8 and img.ndim == 3
    lib = _load()
    if lib is None:
        return _pil_encode(img, quality)
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    return _run_encode(
        lambda out, cap, out_len: lib.hipe_jpeg_encode(
            _as_u8p(img), w, h, c, quality, out, cap, out_len
        ),
        w * h * c + 65536,
    )


def encode_file(img: np.ndarray, path: str, quality: int = 90) -> None:
    """Save HWC uint8 to an image file, dispatching on the extension.

    .jpg/.jpeg (and extension-less paths) use the native JPEG encoder;
    other extensions (BMP / PNG / PPM / ...) save losslessly via PIL —
    the extension-dispatch behavior of the reference's CImg `save()`.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in ("", ".jpg", ".jpeg"):
        with open(path, "wb") as f:
            f.write(encode_bytes(img, quality))
        return
    from PIL import Image

    arr = img[:, :, 0] if img.ndim == 3 and img.shape[2] == 1 else img
    Image.fromarray(arr).save(path)


# ---- Entropy-only decode (feeds the TPU-side device decode) ----


@dataclasses.dataclass
class ComponentCoefs:
    """One component's quantized DCT coefficients (entropy-decoded only)."""

    coefs: np.ndarray      # (height_in_blocks, width_in_blocks, 64) int16,
                           # natural (row-major) order as jdhuff.c stores it
    qtable: np.ndarray     # (64,) uint16, natural order (jdmarker.c get_dqt)
    h_samp: int
    v_samp: int


@dataclasses.dataclass
class JpegCoefficients:
    """Entropy-decoded JPEG: everything the device needs to finish decoding.

    The host-side half of the TPU-native decode split: libjpeg's
    jpeg_read_coefficients does the serial Huffman work (baseline or
    progressive); dequantize + IDCT + upsample + color conversion run on
    device (hipe_tpu/ops/jpeg_decode.py).
    """

    width: int
    height: int
    components: list[ComponentCoefs]
    max_h: int
    max_v: int
    progressive: bool
    # Coded color space (libjpeg J_COLOR_SPACE after header parse):
    # 1=grayscale, 3=YCbCr, 4=CMYK (Adobe transform 0), 5=YCCK (Adobe
    # transform 2). Decides the device-side color transform for
    # 4-component streams.
    color_space: int = 3

    @property
    def num_components(self) -> int:
        return len(self.components)


def read_coefficients(data: bytes) -> JpegCoefficients:
    """Entropy-decode a JPEG to quantized DCT coefficients (no IDCT)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native codec unavailable: coefficient decode requires libjpeg"
        )
    buf = np.frombuffer(data, dtype=np.uint8)
    info = (ctypes.c_int * _INFO_LEN)()
    rc = lib.hipe_jpeg_coef_info(_as_u8p(buf), buf.size, info)
    if rc != 0:
        raise ValueError(f"JPEG coefficient scan failed (rc={rc})")
    ncomps = info[0]
    width, height, max_h, max_v, progressive = (
        info[1], info[2], info[3], info[4], bool(info[5])
    )
    comp_arrays: list[np.ndarray] = []
    qnos: list[int] = []
    samps: list[tuple[int, int]] = []
    for i in range(ncomps):
        h_samp, v_samp, wb, hb, qno = info[6 + 5 * i : 6 + 5 * (i + 1)]
        comp_arrays.append(np.empty((hb, wb, 64), dtype=np.int16))
        qnos.append(qno)
        samps.append((h_samp, v_samp))
    qtabs = np.zeros((4, 64), dtype=np.uint16)
    i16p = ctypes.POINTER(ctypes.c_int16)
    ptrs = (i16p * ncomps)(
        *[a.ctypes.data_as(i16p) for a in comp_arrays]
    )
    rc = lib.hipe_jpeg_read_coefs(
        _as_u8p(buf), buf.size, ptrs,
        qtabs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if rc != 0:
        raise ValueError(f"JPEG coefficient decode failed (rc={rc})")
    components = [
        ComponentCoefs(coefs=arr, qtable=qtabs[qno].copy(),
                       h_samp=hs, v_samp=vs)
        for arr, qno, (hs, vs) in zip(comp_arrays, qnos, samps)
    ]
    return JpegCoefficients(
        width=width, height=height, components=components,
        max_h=max_h, max_v=max_v, progressive=progressive,
        color_space=int(info[26]),
    )


# Subsampling name -> native codec code (jpeg_codec.cpp apply_subsamp)
# and per-component (h_samp, v_samp). "411"/"410"/"311" decode via
# libjpeg's replication (int_upsample) path; "asym" is a legal but
# exotic mismatched-chroma layout (each component gets a different
# upsampler) used to exercise the device decoder's generic path.
_SUB_CODES = {
    "420": 0, "444": 1, "422": 2, "440": 3,
    "411": 4, "410": 5, "asym": 6, "311": 7,
}
_SUB_FACTORS = {
    "420": ((2, 2), (1, 1), (1, 1)),
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "440": ((1, 2), (1, 1), (1, 1)),
    "411": ((4, 1), (1, 1), (1, 1)),
    "410": ((4, 2), (1, 1), (1, 1)),
    "asym": ((2, 2), (2, 1), (1, 1)),
    "311": ((3, 1), (1, 1), (1, 1)),
}


def encode_bytes_opts(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "420",
    progressive: bool = False,
    arithmetic: bool = False,
    restart_interval: int = 0,
    gray_from_rgb: bool = False,
    optimize: bool = False,
) -> bytes:
    """Encode with explicit chroma subsampling (a `_SUB_CODES` name).

    ``arithmetic=True`` emits arithmetic-coded entropy data (SOF9/SOF10
    streams) instead of Huffman; ``restart_interval`` (MCUs, 0 = none)
    inserts RSTn markers. Both change only the host entropy layer — the
    quantized coefficients, and hence the device decode path, are
    identical to the Huffman baseline encode.
    """
    assert img.dtype == np.uint8 and img.ndim == 3
    sub_code = _SUB_CODES[subsampling]
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    return _run_encode(
        lambda out, cap, out_len: lib.hipe_jpeg_encode_opts(
            _as_u8p(img), w, h, c, quality, sub_code, int(progressive),
            int(arithmetic), int(restart_interval), int(gray_from_rgb),
            int(optimize),
            out, cap, out_len,
        ),
        w * h * c + 65536,
    )


def _qt_override_buf(qtables: list) -> np.ndarray:
    """(2, 64) uint16 override for the writer's luma/chroma table slots.

    The writer (jpeg_set_defaults) has exactly two table slots — comp 0
    -> luma, comps 1+2 -> chroma — so a stream whose Cb and Cr use
    DIFFERENT tables cannot be rewritten without requantizing one of
    them; refuse loudly rather than corrupt Cr silently.
    """
    qt_buf = np.zeros((2, 64), dtype=np.uint16)
    qt_buf[0] = np.asarray(qtables[0], dtype=np.uint16)
    if len(qtables) > 1:
        qt_buf[1] = np.asarray(qtables[1], dtype=np.uint16)
        for extra in qtables[2:]:
            if not np.array_equal(qt_buf[1],
                                  np.asarray(extra, dtype=np.uint16)):
                raise ValueError(
                    "stream's chroma components use different quant "
                    "tables; the two-slot writer cannot represent that "
                    "losslessly"
                )
    return qt_buf


def read_markers(data: bytes) -> list[tuple[int, bytes]]:
    """COM and APP1..APP13 markers of a JPEG stream, in file order.

    (marker_code, payload) pairs — Exif (APP1=0xE1), ICC (APP2), XMP,
    comments (COM=0xFE). APP0/JFIF and APP14/Adobe are excluded: the
    writer regenerates those. The jpegtran -copy surface.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    buf = np.frombuffer(data, dtype=np.uint8)
    cap = len(data) + 4096
    out = np.empty(cap, dtype=np.uint8)
    out_len = ctypes.c_size_t()
    rc = lib.hipe_jpeg_read_markers(_as_u8p(buf), buf.size, _as_u8p(out),
                                    cap, out_len)
    if rc == 3:
        out = np.empty(int(out_len.value), dtype=np.uint8)
        rc = lib.hipe_jpeg_read_markers(_as_u8p(buf), buf.size,
                                        _as_u8p(out), out.size, out_len)
    if rc != 0:
        raise ValueError(f"marker read failed (rc={rc})")
    res: list[tuple[int, bytes]] = []
    raw = out[: int(out_len.value)].tobytes()
    p = 0
    while p < len(raw):
        code = int.from_bytes(raw[p:p + 4], "little")
        dlen = int.from_bytes(raw[p + 4:p + 8], "little")
        res.append((code, raw[p + 8:p + 8 + dlen]))
        p += 8 + dlen
    return res


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quant tables jpeg_set_quality installs, natural order."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    qtabs = np.zeros((2, 64), dtype=np.uint16)
    rc = lib.hipe_jpeg_quality_tables(
        quality, qtabs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    )
    if rc != 0:
        raise ValueError(f"quality table query failed (rc={rc})")
    return qtabs[0].copy(), qtabs[1].copy()


def encode_cmyk_bytes(
    img: np.ndarray,
    quality: int = 90,
    ycck: bool = False,
    progressive: bool = False,
) -> bytes:
    """Encode a 4-channel CMYK image (test surface for 4-component decode).

    Samples pass through as-is (the Adobe-inversion convention is the
    caller's concern; decode returns identical values). ycck=True stores
    as Adobe YCCK (transform 2, subsampled chroma); otherwise plain CMYK
    (transform 0, all components full resolution). Both carry the Adobe
    APP14 marker, so `decode_bytes`/`read_coefficients` classify them the
    way libjpeg does.
    """
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 4
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    img = np.ascontiguousarray(img)
    h, w, _ = img.shape
    return _run_encode(
        lambda out, cap, out_len: lib.hipe_jpeg_encode_cmyk(
            _as_u8p(img), w, h, quality, int(ycck), int(progressive),
            out, cap, out_len
        ),
        w * h * 4 + 65536,
    )


def _coef_block_shapes(
    width: int, height: int, ncomps: int, subsampling: str
) -> list[tuple[int, int]]:
    """(Hb, Wb) per component for the unpadded block grid (jdinput.c math)."""
    if ncomps == 1:
        samps = [(1, 1)]
    else:
        samps = list(_SUB_FACTORS[subsampling])
    max_h = max(s[0] for s in samps)
    max_v = max(s[1] for s in samps)
    return [
        (-(-height * v // (8 * max_v)), -(-width * h // (8 * max_h)))
        for h, v in samps
    ]


def write_coefficients(
    coefs: list[np.ndarray],
    width: int,
    height: int,
    quality: int = 90,
    subsampling: str = "420",
    progressive: bool = False,
    arithmetic: bool = False,
    restart_interval: int = 0,
    optimize: bool = False,
    qtables: list[np.ndarray] | None = None,
    markers: list[tuple[int, bytes]] | None = None,
) -> bytes:
    """Entropy-encode quantized DCT coefficients into a full JPEG.

    ``markers``: optional (marker_code, payload) records (from
    :func:`read_markers`) re-emitted after the frame tables — metadata
    preservation for lossless transforms (jpegtran -copy).

    ``qtables``: optional explicit (luma[, chroma]) quant tables, (64,)
    uint16 natural order, installed verbatim instead of the
    jpeg_set_quality tables (lossless transforms of streams whose
    tables are transposed or non-standard need this).

    The host half of the TPU-side encode (ops/jpeg_encode.py computes the
    coefficients on device). coefs[i]: (Hb_i, Wb_i, 64) int16 in natural
    order, the unpadded block grid; MCU-edge dummy blocks are synthesized
    natively with the direct encoder's jccoefct.c semantics, so for
    matching coefficients the output file is byte-identical to
    encode_bytes_opts on the same pixels.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    ncomps = len(coefs)
    sub_code = _SUB_CODES[subsampling]
    arrays = [np.ascontiguousarray(a, dtype=np.int16) for a in coefs]
    # Validate shapes against the geometry the native writer will walk —
    # a mis-shaped array would otherwise be an out-of-bounds heap read
    # in C, not a Python error.
    for i, (a, (hb, wb)) in enumerate(
        zip(arrays, _coef_block_shapes(width, height, ncomps, subsampling))
    ):
        if a.shape != (hb, wb, 64):
            raise ValueError(
                f"component {i} coefficients have shape {a.shape}, "
                f"expected ({hb}, {wb}, 64) for {width}x{height} "
                f"subsampling={subsampling!r}"
            )
    i16p = ctypes.POINTER(ctypes.c_int16)
    ptrs = (i16p * ncomps)(*[a.ctypes.data_as(i16p) for a in arrays])
    qt_ptr = None
    if qtables is not None:
        qt_buf = _qt_override_buf(qtables)
        qt_ptr = qt_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    mk_ptr, mk_len = None, 0
    if markers:
        parts = []
        for code, payload in markers:
            parts.append(int(code).to_bytes(4, "little"))
            parts.append(len(payload).to_bytes(4, "little"))
            parts.append(bytes(payload))
        mk_buf = np.frombuffer(b"".join(parts), dtype=np.uint8)
        mk_ptr, mk_len = _as_u8p(mk_buf), mk_buf.size
    return _run_encode(
        lambda out, cap, out_len: lib.hipe_jpeg_write_coefs(
            width, height, ncomps, quality, sub_code, int(progressive),
            int(arithmetic), int(restart_interval), int(optimize), qt_ptr,
            mk_ptr, mk_len, ptrs, out, cap, out_len,
        ),
        width * height * 3 + 65536,
    )


# ---- Batched entropy coding (serving hot path) ----
#
# GIL-free pthread pools on the C side (hipe_jpeg_{coef_info,read_coefs,
# write_coefs}_batch) replace per-image ctypes fan-out from a Python thread
# pool — two ctypes calls per batch instead of 2*B, and the Huffman work
# runs fully parallel. These feed ServingPipeline (runtime/serve.py), the
# path that replaces the reference's serial host IO loop
# (/root/reference/heterogeneous_blur.c:106-137) at serving scale.

_INFO_LEN = 27  # mirrors INFO_LEN in jpeg_codec.cpp


def _batch_ptrs(datas: list[bytes]):
    """(keepalive bufs, u8 pointer array, length array) for a payload list."""
    bufs = [np.frombuffer(d, dtype=np.uint8) for d in datas]
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    ptrs = (u8p * len(bufs))(*[_as_u8p(b) for b in bufs])
    lens = (ctypes.c_size_t * len(bufs))(*[b.size for b in bufs])
    return bufs, ptrs, lens


def read_coefficients_batch(
    datas: list[bytes], num_threads: int | None = None
) -> list[JpegCoefficients]:
    """Entropy-decode many JPEGs concurrently (native pthread pool).

    Equivalent to [read_coefficients(d) for d in datas] but GIL-free and
    batched: one header-scan pass sizes the buffers, one read pass fills
    them. Raises with the failing indices if any payload is corrupt.
    """
    if not datas:
        return []
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native codec unavailable: coefficient decode requires libjpeg"
        )
    n = len(datas)
    bufs, ptrs, lens = _batch_ptrs(datas)
    nt = num_threads or (os.cpu_count() or 1)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    infos = np.zeros((n, _INFO_LEN), dtype=np.intc)
    rcs = np.zeros(n, dtype=np.intc)
    fails = lib.hipe_jpeg_coef_info_batch(
        ptrs, lens, n, infos.ctypes.data_as(c_int_p),
        rcs.ctypes.data_as(c_int_p), nt,
    )
    if fails:
        bad = np.nonzero(rcs)[0].tolist()
        raise ValueError(
            f"{fails} payloads failed JPEG coefficient scan (indices {bad})"
        )
    i16p = ctypes.POINTER(ctypes.c_int16)
    ptr_table = (i16p * (n * 4))()
    comp_arrays: list[list[np.ndarray]] = []
    for i in range(n):
        arrs = []
        for ci in range(int(infos[i, 0])):
            _, _, wb, hb, _ = (int(x) for x in infos[i, 6 + 5 * ci : 11 + 5 * ci])
            a = np.empty((hb, wb, 64), dtype=np.int16)
            arrs.append(a)
            ptr_table[i * 4 + ci] = a.ctypes.data_as(i16p)
        comp_arrays.append(arrs)
    qtabs = np.zeros((n, 4, 64), dtype=np.uint16)
    rcs2 = np.zeros(n, dtype=np.intc)
    fails = lib.hipe_jpeg_read_coefs_batch(
        ptrs, lens, n, ptr_table,
        qtabs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        rcs2.ctypes.data_as(c_int_p), nt,
    )
    if fails:
        bad = np.nonzero(rcs2)[0].tolist()
        raise ValueError(
            f"{fails} payloads failed JPEG coefficient decode (indices {bad})"
        )
    out = []
    for i in range(n):
        info = infos[i]
        comps = []
        for ci in range(int(info[0])):
            h_samp, v_samp, _, _, qno = (
                int(x) for x in info[6 + 5 * ci : 11 + 5 * ci]
            )
            comps.append(
                ComponentCoefs(
                    coefs=comp_arrays[i][ci], qtable=qtabs[i, qno].copy(),
                    h_samp=h_samp, v_samp=v_samp,
                )
            )
        out.append(
            JpegCoefficients(
                width=int(info[1]), height=int(info[2]), components=comps,
                max_h=int(info[3]), max_v=int(info[4]),
                progressive=bool(info[5]), color_space=int(info[26]),
            )
        )
    return out


def write_coefficients_batch(
    coefs: list[np.ndarray],
    width: int,
    height: int,
    quality: int = 90,
    subsampling: str = "420",
    progressive: bool = False,
    arithmetic: bool = False,
    restart_interval: int = 0,
    optimize: bool = False,
    qtables: list[np.ndarray] | None = None,
    num_threads: int | None = None,
) -> list[bytes]:
    """Entropy-encode a coefficient batch into JPEG files concurrently.

    coefs[ci]: (B, Hb_ci, Wb_ci, 64) int16 — one stacked batch per
    component, shared geometry/quality/subsampling (the serving group
    case; the device encoder emits exactly this layout). Equivalent to B
    write_coefficients calls but on the native pthread pool. Images whose
    stream exceeds the preallocated capacity are retried at the exact
    size the C side reports.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    ncomps = len(coefs)
    sub_code = _SUB_CODES[subsampling]
    arrays = [np.ascontiguousarray(a, dtype=np.int16) for a in coefs]
    b = arrays[0].shape[0]
    for ci, (a, (hb, wb)) in enumerate(
        zip(arrays, _coef_block_shapes(width, height, ncomps, subsampling))
    ):
        if a.shape != (b, hb, wb, 64):
            raise ValueError(
                f"component {ci} coefficients have shape {a.shape}, "
                f"expected ({b}, {hb}, {wb}, 64) for {width}x{height} "
                f"subsampling={subsampling!r}"
            )
    i16p = ctypes.POINTER(ctypes.c_int16)
    # Vectorized pointer-table construction: per-image slices of each
    # stacked component are base + i*stride, so the count*4 table is pure
    # address arithmetic in numpy — no per-image ctypes marshalling (the
    # remaining Python cost of the batch path on a single-core host).
    addrs = np.zeros(b * 4, dtype=np.uintp)
    for ci in range(ncomps):
        a = arrays[ci]
        addrs[ci::4] = a.ctypes.data + np.arange(b, dtype=np.uintp) * (
            a.strides[0]
        )
    ptr_table = ctypes.cast(addrs.ctypes.data, ctypes.POINTER(i16p))
    # Per-image slot sized for realistic streams (~1 byte/px is already
    # far above typical JPEG rates), not the absolute worst case — an
    # image that overflows its slot is retried at the exact reported size
    # below, so a tight cap costs one re-encode of rare outliers instead
    # of a 50x larger batch buffer (page-fault overhead at batch 500+).
    cap = width * height + 65536
    out = np.empty((b, cap), dtype=np.uint8)
    out_lens = np.zeros(b, dtype=np.uintp)
    rcs = np.zeros(b, dtype=np.intc)
    nt = num_threads or (os.cpu_count() or 1)
    qt_ptr = None
    if qtables is not None:
        qt_buf = _qt_override_buf(qtables)
        qt_ptr = qt_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    lib.hipe_jpeg_write_coefs_batch(
        width, height, ncomps, quality, sub_code, int(progressive),
        int(arithmetic), int(restart_interval), int(optimize), qt_ptr,
        ptr_table, b, _as_u8p(out), cap,
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nt,
    )
    results: list[bytes] = []
    for i in range(b):
        rc = int(rcs[i])
        if rc == 0:
            results.append(out[i, : int(out_lens[i])].tobytes())
        elif rc == 3:
            # Didn't fit the preallocated slot: redo this one image with
            # the exact-size retry built into write_coefficients.
            results.append(
                write_coefficients(
                    [arrays[ci][i] for ci in range(ncomps)], width, height,
                    quality=quality, subsampling=subsampling,
                    progressive=progressive, arithmetic=arithmetic,
                    restart_interval=restart_interval, optimize=optimize,
                    qtables=qtables,
                )
            )
        else:
            raise ValueError(
                f"JPEG coefficient write failed for image {i} (rc={rc})"
            )
    return results


# ---- PIL fallbacks (environments without g++/libjpeg) ----

def _pil_decode(data: bytes) -> np.ndarray:
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if img.mode not in ("RGB", "L", "CMYK"):
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    # CMYK keeps the native codec's 4-channel shape contract. Values can
    # differ from libjpeg's raw output for Adobe streams (PIL applies the
    # inverted-CMYK convention); the fallback is shape-faithful, not
    # bit-faithful, for 4-component files.
    return arr


def _pil_encode(img: np.ndarray, quality: int) -> bytes:
    import io

    from PIL import Image

    mode = "L" if img.shape[2] == 1 else "RGB"
    pimg = Image.fromarray(img.squeeze(-1) if mode == "L" else img, mode)
    buf = io.BytesIO()
    pimg.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()
