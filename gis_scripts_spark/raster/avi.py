"""From-scratch AVI (RIFF) video container with MJPEG frames.

Public-spec implementation (Microsoft RIFF/AVI file format + the OpenDML
MJPEG convention); rides the engine's own ITU-T T.81 JPEG codec
(raster/jpeg.py) for per-frame pixels, so `fmt` tags like ``avi`` in a
multimodal table decode for real — the video analogue of what jpeg.py did
for the image column. Reference parity: the reference shells out to
ffmpeg-style tooling for frame extraction; here frame sampling is a
structural container walk (operators/multimodal.sample_frames), executed
map-local inside Arrow batches.

Layout written by :func:`avi_encode` (and accepted, along with common
variants, by the readers)::

    RIFF <sz> 'AVI '
      LIST 'hdrl'
        'avih' (56-byte main header)
        LIST 'strl'
          'strh' (56-byte stream header, fccType='vids', handler='MJPG')
          'strf' (40-byte BITMAPINFOHEADER, biCompression='MJPG' or 0)
      LIST 'movi'
        '00dc' <complete JPEG>   (MJPG; padded to even)
        '00db' <raw DIB rows>    (biCompression=0: bottom-up BGR, 4-byte
                                  row alignment — the uncompressed case)
      'idx1' (16 bytes/entry: ckid, flags, offset-from-'movi'-fourcc, size)

MJPEG detail that matters in the wild: many writers emit *abbreviated*
JPEG frames with no DHT segments (the "AVI1" convention — decoders must
assume the T.81 Annex K typical tables). :func:`_ensure_dht` splices the
four Annex K tables in front of SOS by pure byte surgery (no decode), so
every frame this module yields is a self-contained standards-complete
JPEG that `codec.decode` sniffs by magic.

'rec ' grouping LISTs inside movi (used by interleaved writers) are
walked recursively; streams other than 0 (audio '01wb' etc.) are skipped
structurally — counting frames never touches payload bytes.
"""
from __future__ import annotations

import struct

import numpy as np

from gis_scripts_spark.raster import jpeg as _jpeg


# ------------------------------------------------------------------ RIFF io
def _chunks(buf: bytes, i: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking [i, end)."""
    while i + 8 <= end:
        fourcc = bytes(buf[i : i + 4])
        (sz,) = struct.unpack_from("<I", buf, i + 4)
        yield fourcc, i + 8, sz
        i += 8 + sz + (sz & 1)  # chunks are word-aligned


def _parse(buf: bytes):
    """-> (main_header dict, video strf dict, movi list of
    (stream, compressed: bool, payload_start, payload_size))."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' signature missing)")
    (riff_sz,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_sz)
    avih = None
    strf = None
    vids_stream = None
    frames: list[tuple[int, bool, int, int]] = []

    def walk_movi(i, e):
        for cc, p, sz in _chunks(buf, i, e):
            if cc == b"LIST" and buf[p : p + 4] == b"rec ":
                walk_movi(p + 4, p + sz)
            elif len(cc) == 4 and cc[2:4] in (b"dc", b"db") and cc[:2].isdigit():
                frames.append((int(cc[:2]), cc[2:4] == b"dc", p, sz))

    def walk_strl(i, e):
        nonlocal strf, vids_stream
        fcc_type = None
        for cc, p, sz in _chunks(buf, i, e):
            if cc == b"strh":
                fcc_type = buf[p : p + 4]
            elif cc == b"strf" and fcc_type == b"vids" and strf is None:
                (bi_sz, w, h, planes, bits, comp) = struct.unpack_from(
                    "<IiiHHI", buf, p
                )
                strf = {
                    "width": w,
                    "height": abs(h),
                    "top_down": h < 0,
                    "bit_count": bits,
                    "compression": struct.pack("<I", comp),
                }

    def walk_hdrl(i, e):
        nonlocal avih, vids_stream
        n_strl = 0
        for cc, p, sz in _chunks(buf, i, e):
            if cc == b"avih":
                v = struct.unpack_from("<14I", buf, p)
                avih = {
                    "usec_per_frame": v[0],
                    "total_frames": v[4],
                    "streams": v[6],
                    "width": v[8],
                    "height": v[9],
                }
            elif cc == b"LIST" and buf[p : p + 4] == b"strl":
                if strf is None:
                    vids_candidate = n_strl
                    walk_strl(p + 4, p + sz)
                    if strf is not None:
                        vids_stream = vids_candidate
                n_strl += 1

    for cc, p, sz in _chunks(buf, 12, end):
        if cc == b"LIST" and buf[p : p + 4] == b"hdrl":
            walk_hdrl(p + 4, p + sz)
        elif cc == b"LIST" and buf[p : p + 4] == b"movi":
            walk_movi(p + 4, p + sz)
    if avih is None or strf is None:
        raise ValueError("AVI missing avih/vids strf headers")
    if vids_stream is None:
        vids_stream = 0
    frames = [f for f in frames if f[0] == vids_stream]
    return avih, strf, frames


# ------------------------------------------------- MJPEG default-table splice
def _dht_segment() -> bytes:
    """One DHT marker segment carrying the four T.81 Annex K typical
    tables — what an AVI1 abbreviated frame implicitly assumes."""
    body = bytearray()
    for tc_th, bits, vals in (
        (0x00, _jpeg.DC_LUMA_BITS, _jpeg.DC_LUMA_VALS),
        (0x01, _jpeg.DC_CHROMA_BITS, _jpeg.DC_CHROMA_VALS),
        (0x10, _jpeg.AC_LUMA_BITS, _jpeg.AC_LUMA_VALS),
        (0x11, _jpeg.AC_CHROMA_BITS, _jpeg.AC_CHROMA_VALS),
    ):
        body.append(tc_th)
        body.extend(bits)
        body.extend(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + bytes(body)


def _ensure_dht(frame: bytes) -> bytes:
    """Return a self-contained JPEG: if the frame carries no DHT segment
    (the AVI1 / MJPEG abbreviated convention), splice the Annex K typical
    tables immediately before SOS. Pure byte surgery — no entropy decode."""
    if frame[:2] != b"\xff\xd8":
        raise ValueError("MJPG chunk is not a JPEG (no SOI)")
    i = 2
    sos = None
    while i + 4 <= len(frame):
        if frame[i] != 0xFF:
            raise ValueError("malformed JPEG in MJPG chunk")
        m = frame[i + 1]
        if m == 0xC4:  # has its own DHT — already self-contained
            return frame
        if m == 0xDA:
            sos = i
            break
        if 0xD0 <= m <= 0xD9:  # RST/SOI/EOI have no length field
            i += 2
            continue
        (ln,) = struct.unpack_from(">H", frame, i + 2)
        i += 2 + ln
    if sos is None:
        raise ValueError("JPEG frame without SOS")
    return frame[:sos] + _dht_segment() + frame[sos:]


def _strip_dht(frame: bytes) -> bytes:
    """Remove every DHT segment (writer-side AVI1 emulation, for tests and
    for byte parity with in-the-wild MJPEG streams)."""
    out = bytearray(frame[:2])
    i = 2
    while i + 2 <= len(frame):
        m = frame[i + 1]
        if m == 0xDA:  # SOS: copy the rest verbatim (entropy data follows)
            out += frame[i:]
            return bytes(out)
        if 0xD0 <= m <= 0xD9:
            out += frame[i : i + 2]
            i += 2
            continue
        (ln,) = struct.unpack_from(">H", frame, i + 2)
        if m != 0xC4:
            out += frame[i : i + 2 + ln]
        i += 2 + ln
    return bytes(out)


# ------------------------------------------------------------------- decode
def avi_probe_shape(buf: bytes) -> tuple[int, int, int]:
    """(h, w, bands) from the headers only — no frame decode."""
    _avih, strf, _frames = _parse(buf)
    bands = 1 if strf["bit_count"] == 8 else 3
    return strf["height"], strf["width"], bands


def avi_frame_count(buf: bytes) -> int:
    """Structural count of video frame chunks — payload bytes untouched."""
    return len(_parse(buf)[2])


def _dib_to_array(raw: bytes, strf: dict) -> np.ndarray:
    """Uncompressed '00db' rows -> (h, w, bands) uint8. DIB convention:
    BGR order, rows 4-byte aligned, bottom-up unless biHeight < 0."""
    w, h, bits = strf["width"], strf["height"], strf["bit_count"]
    if bits not in (8, 24):
        raise NotImplementedError(f"DIB bit depth {bits} not supported")
    ch = bits // 8
    stride = (w * ch + 3) & ~3
    a = np.frombuffer(raw[: stride * h], np.uint8).reshape(h, stride)
    a = a[:, : w * ch].reshape(h, w, ch)
    if not strf["top_down"]:
        a = a[::-1]
    if ch == 3:
        a = a[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(a)


def avi_iter_frames(buf: bytes):
    """Yield (frame_idx, image bytes decodable by codec.decode). MJPG
    chunks are yielded as self-contained JPEGs (Annex K tables spliced in
    if the stream is AVI1-abbreviated — no pixel decode happens here);
    uncompressed DIB chunks are converted and re-emitted as lossless PNG."""
    from gis_scripts_spark.raster import codec

    buf = bytes(buf)
    _avih, strf, frames = _parse(buf)
    for idx, (_s, compressed, p, sz) in enumerate(frames):
        raw = buf[p : p + sz]
        if compressed:
            yield idx, _ensure_dht(raw)
        else:
            yield idx, codec.png_encode(_dib_to_array(raw, strf))


def avi_decode_frames(buf: bytes) -> list[np.ndarray]:
    """Fully decoded (h, w, bands) uint8 frames."""
    from gis_scripts_spark.raster import codec

    return [codec.decode(b) for _i, b in avi_iter_frames(buf)]


# ------------------------------------------------------------------- encode
def avi_encode(
    frames: list[np.ndarray],
    fps: int = 10,
    quality: int = 92,
    subsampling: str = "4:4:4",
    compressed: bool = True,
    strip_dht: bool = False,
) -> bytes:
    """Encode frames (uniform (h, w, 1|3) uint8) as an AVI.

    compressed=True -> MJPG '00dc' chunks via the from-scratch T.81
    encoder; strip_dht additionally removes the DHT segments (the AVI1
    abbreviated-stream convention, exercising the reader's Annex-K
    splice). compressed=False -> raw '00db' DIB rows (lossless)."""
    if not frames:
        raise ValueError("avi_encode needs at least one frame")
    h, w = frames[0].shape[:2]
    bands = frames[0].shape[2] if frames[0].ndim == 3 else 1
    for f in frames:
        fh, fw = f.shape[:2]
        if (fh, fw) != (h, w):
            raise ValueError("AVI frames must share one shape")

    payloads: list[bytes] = []
    if compressed:
        for f in frames:
            jb = _jpeg.jpeg_encode(f, quality=quality, subsampling=subsampling)
            payloads.append(_strip_dht(jb) if strip_dht else jb)
        ckid, bi_comp, bits = b"00dc", b"MJPG", 24
    else:
        if bands not in (1, 3):
            raise ValueError("raw DIB frames must have 1 or 3 bands")
        bits = 8 * bands
        stride = (w * bands + 3) & ~3
        for f in frames:
            a = f.reshape(h, w, bands)
            if bands == 3:
                a = a[:, :, ::-1]  # RGB -> BGR
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * bands] = a.reshape(h, w * bands)
            payloads.append(rows[::-1].tobytes())  # bottom-up
        ckid, bi_comp = b"00db", struct.pack("<I", 0)

    def chunk(cc: bytes, payload: bytes) -> bytes:
        return cc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    usec = int(round(1_000_000 / max(fps, 1)))
    max_sz = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I", usec, max_sz * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_sz, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + (b"MJPG" if compressed else b"DIB ")
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1), 0,
                      len(frames), max_sz, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, bits, bi_comp,
        len(payloads[0]), 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx_entries = []
    for p in payloads:
        # idx1 offset convention: from the 'movi' fourcc to the chunk ckid
        idx_entries.append((len(movi_body) + 4, len(p)))
        movi_body += chunk(ckid, p)
    movi = lst(b"movi", bytes(movi_body))
    idx1 = chunk(
        b"idx1",
        b"".join(
            ckid + struct.pack("<III", 0x10, off, sz) for off, sz in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
