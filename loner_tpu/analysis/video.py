"""Pure-Python MJPEG-in-AVI video assembly.

The reference assembles its flythrough .mp4 inline with OpenCV's
VideoWriter (reference analysis/renderer.py:322-480). This environment has
neither OpenCV's video stack nor ffmpeg, so we write the video container
ourselves: each frame is JPEG-encoded with PIL and wrapped in a RIFF/AVI
container with the 'MJPG' fourcc — a format every mainstream player
(VLC, ffmpeg, QuickTime, browsers via conversion) accepts. No third-party
video dependency, no subprocess.

The AVI layout written here is the minimal standard one:

    RIFF('AVI ')
      LIST('hdrl')
        'avih'  MainAVIHeader
        LIST('strl')
          'strh' AVIStreamHeader (vids/MJPG)
          'strf' BITMAPINFOHEADER (biCompression='MJPG')
      LIST('movi')
        '00dc' <jpeg>   (one chunk per frame, even-padded)
        ...
      'idx1'  index (AVIIF_KEYFRAME for every frame — MJPEG is all-intra)
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterable, List, Sequence, Tuple, Union

import numpy as np

__all__ = ["write_mjpeg_avi", "read_avi_frame_count"]

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _encode_jpeg(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    arr = np.asarray(frame)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0.0, 1.0)
        arr = (arr * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    buf = io.BytesIO()
    Image.fromarray(arr, mode="RGB").save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _load_frame(frame: Union[str, np.ndarray]) -> np.ndarray:
    if isinstance(frame, str):
        from PIL import Image

        with Image.open(frame) as im:
            return np.asarray(im.convert("RGB"))
    return np.asarray(frame)


def write_mjpeg_avi(
    path: str,
    frames: Sequence[Union[str, np.ndarray]],
    fps: int = 10,
    quality: int = 90,
) -> str:
    """Assemble ``frames`` (PNG/JPEG file paths or HxWx{1,3,4} arrays,
    uint8 or float in [0,1]) into an MJPEG .avi at ``path``.

    All frames must share one resolution (the first frame sets it; later
    frames are center-cropped/padded is NOT attempted — a mismatch raises).
    Returns ``path``.
    """
    if not frames:
        raise ValueError("write_mjpeg_avi: no frames")

    first = _load_frame(frames[0])
    height, width = first.shape[:2]

    jpegs: List[bytes] = []
    for f in frames:
        arr = _load_frame(f)
        if arr.shape[:2] != (height, width):
            raise ValueError(
                f"frame resolution {arr.shape[:2]} != first frame {(height, width)}"
            )
        jpegs.append(_encode_jpeg(arr, quality))

    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    # --- movi payload + idx1 (offsets are relative to the 'movi' fourcc) ---
    movi = bytearray(b"movi")
    idx = bytearray()
    for j in jpegs:
        offset = len(movi)
        movi += b"00dc" + struct.pack("<I", len(j)) + j
        if len(j) % 2:
            movi += b"\x00"
        idx += b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, offset, len(j))

    # --- headers ---
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1_000_000 / max(fps, 1)),  # dwMicroSecPerFrame
        max_bytes * fps,               # dwMaxBytesPerSec
        0,                             # dwPaddingGranularity
        _AVIF_HASINDEX,                # dwFlags
        n,                             # dwTotalFrames
        0,                             # dwInitialFrames
        1,                             # dwStreams
        max_bytes,                     # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,                    # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0,          # dwFlags
            0, 0,       # wPriority, wLanguage
            0,          # dwInitialFrames
            1,          # dwScale
            max(fps, 1),  # dwRate (fps = rate/scale)
            0,          # dwStart
            n,          # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            10000,      # dwQuality
            0,          # dwSampleSize (0 = variable)
        )
        + struct.pack("<hhhh", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                 # biSize
        width,
        height,
        1,                  # biPlanes
        24,                 # biBitCount
        b"MJPG",            # biCompression
        width * height * 3, # biSizeImage
        0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi_chunk = chunk(b"LIST", bytes(movi))
    idx1 = chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi_chunk + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path


def read_avi_frame_count(path: str) -> Tuple[int, Tuple[int, int], int]:
    """Parse an AVI written by :func:`write_mjpeg_avi`; return
    ``(n_frames, (height, width), fps)`` from the headers. Validates the
    RIFF structure and that the idx1 entry count matches the header."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError("RIFF size mismatch")

    # hdrl LIST comes first: locate avih + strh.
    pos = 12
    n_frames = width = height = fps = None
    idx_entries = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"LIST":
            list_type = payload[:4]
            if list_type in (b"hdrl", b"strl"):
                # descend
                inner = pos + 12
                end = pos + 8 + size
                sub = data[inner:end]
                off = 0
                while off + 8 <= len(sub):
                    sub_cc = sub[off : off + 4]
                    (sub_sz,) = struct.unpack("<I", sub[off + 4 : off + 8])
                    sub_pl = sub[off + 8 : off + 8 + sub_sz]
                    if sub_cc == b"avih":
                        vals = struct.unpack("<14I", sub_pl[:56])
                        n_frames = vals[4]
                        width, height = vals[8], vals[9]
                        fps = round(1_000_000 / vals[0]) if vals[0] else 0
                    elif sub_cc == b"LIST" and sub_pl[:4] == b"strl":
                        sub2 = sub_pl[4:]
                        if sub2[:4] == b"strh":
                            (sz2,) = struct.unpack("<I", sub2[4:8])
                            strh = sub2[8 : 8 + sz2]
                            if strh[:4] != b"vids" or strh[4:8] != b"MJPG":
                                raise ValueError("stream is not vids/MJPG")
                    off += 8 + sub_sz + (sub_sz % 2)
        elif fourcc == b"idx1":
            idx_entries = size // 16
        pos += 8 + size + (size % 2)

    if n_frames is None:
        raise ValueError("no avih header found")
    if idx_entries is not None and idx_entries != n_frames:
        raise ValueError(f"idx1 entries {idx_entries} != header frames {n_frames}")
    return n_frames, (height, width), fps


def extract_first_jpeg(path: str) -> bytes:
    """Return the first '00dc' chunk's JPEG bytes (for tests)."""
    with open(path, "rb") as f:
        data = f.read()
    at = data.find(b"movi")
    if at < 0:
        raise ValueError("no movi list")
    if data[at + 4 : at + 8] != b"00dc":
        raise ValueError("first movi chunk is not 00dc")
    (size,) = struct.unpack("<I", data[at + 8 : at + 12])
    return data[at + 12 : at + 12 + size]
