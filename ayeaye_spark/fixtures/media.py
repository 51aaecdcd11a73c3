"""Committed deterministic media fixture (catalog entries
``media_decode_report``, ``media_audio_quality``, ``media_scene_cuts``).

Eleven small files under ``fixtures/media/`` — two renderings of the
SAME image (PNG + 24-bit BMP, a cross-format near-dup pair), a 16-bit
grayscale PNG, a global-color-table GIF, an 8-bit paletted BMP, four
WAVs (PCM tone / silence-heavy / hard-clipped / G.711 mu-law chirp),
and two real RIFF/AVI clips (uncompressed DIB frames; ``scenes.avi``
carries two hard scene changes) — pin the whole media-decode path end
to end: ``binaryFile``
scan → :func:`operators.multimodal.decode_images` with the
integer-exact :func:`operators.multimodal.exact_decode` kernel →
mean / perceptual-hash / dup-group rollup, plus the integer-exact
audio-quality (:func:`operators.multimodal.exact_audio_stats`) and
frame-signature scene-cut paths.

Every encoder below is byte-deterministic (fixed zlib level, fixed
header layout, literal-code LZW), so the committed files, a fresh
:func:`ensure_media_fixture` write, and the ``MEDIA_EXPECTED``
constants the DuckDB oracle replays from are all provably the same
data (``tests/test_operators.py::TestMediaFixture`` asserts byte
equality and decode equality).

Reference parity: the reference treats media as opaque payload bytes
moved by connectors; pixel-level decode is beyond-reference surface
(SURVEY §2 north-star), pinned here the same way the crawl fixture
pins the WARC path.
"""

from __future__ import annotations

import os
import struct
import zlib

MEDIA_DIR_NAME = "media"


def media_fixture_dir() -> str:
    return os.path.join(os.path.dirname(__file__), MEDIA_DIR_NAME)


# ---------------------------------------------------------------- encoders


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png_rgb(px) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor PNG, filter 0 scanlines,
    zlib level 9 (deterministic for fixed input)."""
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def encode_png_gray16(vals) -> bytes:
    """(h, w) uint16 -> 16-bit grayscale PNG (big-endian samples)."""
    import numpy as np

    h, w = vals.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + np.ascontiguousarray(vals[r]).astype(">u2").tobytes()
        for r in range(h)
    )
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def encode_bmp24(px) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (bottom-up BGR
    rows, stride padded to 4)."""
    h, w, _ = px.shape
    stride = ((w * 3 + 3) // 4) * 4
    body = b"".join(
        px[r][:, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for r in reversed(range(h))
    )
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(body), 0, 0, 0, 0))
    return hdr + body


def encode_bmp8(idx, palette_rgb) -> bytes:
    """(h, w) uint8 index array + [(r, g, b)] palette -> uncompressed
    8-bit paletted BMP (RGBQUAD entries are stored B, G, R, 0)."""
    h, w = idx.shape
    pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in palette_rgb)
    stride = ((w + 3) // 4) * 4
    body = b"".join(
        bytes(idx[r]) + b"\x00" * (stride - w)
        for r in reversed(range(h))
    )
    data_off = 54 + len(pal)
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                         len(body), 0, 0, len(palette_rgb), 0))
    return hdr + pal + body


def encode_gif(idx, palette_rgb) -> bytes:
    """(h, w) uint8 index array + [(r, g, b)] palette -> GIF89a with a
    global color table, literal-code LZW (min code size 7, periodic
    CLEAR so the code width never grows — valid for palettes <= 128)."""
    h, w = idx.shape
    n = len(palette_rgb)
    gct_bits = max(1, (n - 1).bit_length())
    pal = bytearray()
    for r, g, b_ in palette_rgb:
        pal += bytes([r, g, b_])
    pal += b"\x00" * (3 * ((1 << gct_bits) - n))
    hdr = (b"GIF89a" + struct.pack("<HH", w, h)
           + bytes([0x80 | (gct_bits - 1), 0, 0]) + bytes(pal))
    desc = b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    mcs = 7
    clear, width = 1 << mcs, mcs + 1
    bits, acc, nacc = bytearray(), 0, 0

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for i, v in enumerate(idx.reshape(-1)):
        if i and i % 100 == 0:
            emit(clear)
        emit(int(v))
    emit(clear + 1)  # EOI
    if nacc:
        bits.append(acc & 0xFF)
    data = bytes(bits)
    blocks = b"".join(
        bytes([min(255, len(data) - o)]) + data[o:o + 255]
        for o in range(0, len(data), 255)
    )
    return hdr + desc + bytes([mcs]) + blocks + b"\x00\x3B"


def encode_wav_pcm16(samples, rate: int = 8000) -> bytes:
    """iterable of int16 -> mono 16-bit PCM WAV."""
    body = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def _mulaw_byte(v: int) -> int:
    """Classic G.711 mu-law compress of one int16 sample (bias 0x84,
    clip 32635, invert) — the inverse direction of
    ``operators.multimodal._mulaw_expand``; deterministic, so the
    committed fixture bytes are reproducible."""
    sign = 0x80 if v < 0 else 0
    v = min(abs(v), 32635) + 0x84
    exp, mask = 7, 0x4000
    while exp > 0 and not (v & mask):
        exp -= 1
        mask >>= 1
    mant = (v >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def encode_wav_mulaw(samples, rate: int = 8000) -> bytes:
    """iterable of int16 -> mono G.711 mu-law WAV (afmt 7, 8-bit) —
    exercises the telephony-codec expansion branch of the exact audio
    kernel end to end."""
    body = bytes(_mulaw_byte(int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


# ------------------------------------------------------------ fixture data


def _gradient_px():
    """16x12 RGB gradient — rendered as BOTH gradient.png and
    gradient.bmp (the cross-format near-dup pair: identical pixels,
    identical dHash)."""
    import numpy as np

    h, w = 12, 16
    px = np.zeros((h, w, 3), np.uint8)
    for r in range(h):
        for c in range(w):
            px[r, c] = ((r * 16 + c * 5) % 256,
                        ((r * 37) ^ (c * 53)) % 256,
                        ((r * r + c * 13) * 7) % 256)
    return px


def _deep16_vals():
    import numpy as np

    h, w = 10, 14
    return np.fromfunction(
        lambda r, c: ((r * 4111) ^ (c * 2571)) % 65536, (h, w),
        dtype=np.int64,
    ).astype(np.uint16)


def _gif_idx_palette():
    import numpy as np

    idx = np.fromfunction(
        lambda r, c: (r + c) % 8, (10, 13), dtype=np.int64
    ).astype(np.uint8)
    palette = [((i * 30) % 256, 255 - i * 28, (i * 17) % 256)
               for i in range(8)]
    return idx, palette


def _bmp8_idx_palette():
    import numpy as np

    idx = np.fromfunction(
        lambda r, c: (r * 3 + c * 7) % 16, (11, 14), dtype=np.int64
    ).astype(np.uint8)
    palette = [((i * 15) % 256, (i * 40) % 256, 255 - i * 10)
               for i in range(16)]
    return idx, palette


def media_fixture_files() -> dict[str, bytes]:
    """name -> deterministic bytes, the committed fixture contents."""
    import numpy as np

    from ..operators.multimodal import write_avi

    grad = _gradient_px()
    gidx, gpal = _gif_idx_palette()
    bidx, bpal = _bmp8_idx_palette()
    tone = [8000 if (i // 10) % 2 == 0 else -8000 for i in range(120)]
    # three-frame clip: the gradient shifted per frame (real RIFF/AVI,
    # uncompressed DIB stream — exercises the round-12 demuxer's
    # metadata path through the oracle record)
    clip = write_avi([np.roll(grad, k, axis=1) for k in range(3)], fps=5)
    # audio-quality trio (catalog entry media_audio_quality): a
    # silence-heavy clip, a hard-clipped clip, and a mu-law-coded chirp
    # (integer chirp — no float trig, byte-deterministic everywhere)
    quiet = ([3000 if i % 2 == 0 else -3000 for i in range(40)]
             + [0] * 80
             + [200 if i % 2 == 0 else -200 for i in range(30)])
    clipped = ([32767 if i % 2 == 0 else -32767 for i in range(80)]
               + [12000 if i % 2 == 0 else -12000 for i in range(40)])
    chirp = [((i * i * 37) % 16000) - 8000 for i in range(160)]
    # five-frame clip with two hard scene changes (catalog entry
    # media_scene_cuts): gradient -> LSB-jittered gradient (same scene,
    # pixel bytes differ but the dHash field is stable), checkerboard
    # x2 (static scene), vertical stripes
    checker = np.where(
        (np.indices((12, 16)).sum(axis=0) % 2 == 0)[..., None], 230, 25
    ).astype(np.uint8).repeat(3, axis=2).reshape(12, 16, 3)
    diag = np.fromfunction(
        lambda r, c, k: (r * 23 + c * 91) % 256, (12, 16, 3)
    ).astype(np.uint8)
    scenes = write_avi([grad, grad ^ 1, checker, checker, diag], fps=5)
    return {
        "gradient.png": encode_png_rgb(grad),
        "gradient.bmp": encode_bmp24(grad),
        "deep16.png": encode_png_gray16(_deep16_vals()),
        "palette.gif": encode_gif(gidx, gpal),
        "blocks8.bmp": encode_bmp8(bidx, bpal),
        "tone.wav": encode_wav_pcm16(tone),
        "clip.avi": clip,
        "quiet.wav": encode_wav_pcm16(quiet),
        "clipped.wav": encode_wav_pcm16(clipped),
        "chirp_mulaw.wav": encode_wav_mulaw(chirp),
        "scenes.avi": scenes,
    }


def ensure_media_fixture() -> str:
    """Directory of the committed media files, writing any absent file
    first (encoders are byte-deterministic, so a rewrite reproduces the
    committed bytes exactly)."""
    d = media_fixture_dir()
    os.makedirs(d, exist_ok=True)
    for name, blob in media_fixture_files().items():
        path = os.path.join(d, name)
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(blob)
    return d


# Pinned expected decode of each committed file under
# operators.multimodal.exact_decode — every value an integer/string so
# the DuckDB oracle replays them as VALUES literals with bit-identical
# hashing.  (file, format, width, height, channels, pixel_sum, n_vals,
# dhash); regenerated by tests/test_operators.py::TestMediaFixture when
# the fixture changes.
MEDIA_EXPECTED: list[tuple] = [
    ('blocks8.bmp', 'bmp', 14, 11, 3,
     61895, 462, 4095621213176290372),
    ('chirp_mulaw.wav', 'wav', None, None, 1,
     None, None, None),
    ('clip.avi', 'avi', 16, 12, None,
     None, None, None),
    ('clipped.wav', 'wav', None, None, 1,
     None, None, None),
    ('deep16.png', 'png', 14, 10, 1,
     12940, 140, 59710262540434945),
    ('gradient.bmp', 'bmp', 16, 12, 3,
     71360, 576, 2604529512685581718),
    ('gradient.png', 'png', 16, 12, 3,
     71360, 576, 2604529512685581718),
    ('palette.gif', 'gif', 13, 10, 3,
     41605, 390, 290508776329610764),
    ('quiet.wav', 'wav', None, None, 1,
     None, None, None),
    ('scenes.avi', 'avi', 16, 12, None,
     None, None, None),
    ('tone.wav', 'wav', None, None, 1,
     None, None, None),
]

# Pinned expected integer audio stats of each WAV under
# ``operators.multimodal.exact_audio_stats`` — same pin-and-replay
# contract as MEDIA_EXPECTED (catalog entry ``media_audio_quality``).
# (file, codec, channels, sample_rate, n_samples, peak_abs, sum_sq,
# n_silence, n_clipped, n_zero_cross)
MEDIA_AUDIO_EXPECTED: list[tuple] = [
    ('chirp_mulaw.wav', 'mulaw', 1, 8000, 160,
     7932, 3748322560, 9, 0, 92),
    ('clipped.wav', 'pcm16', 1, 8000, 120,
     32767, 91654103120, 0, 80, 119),
    ('quiet.wav', 'pcm16', 1, 8000, 150,
     3000, 361200000, 110, 0, 69),
    ('tone.wav', 'pcm16', 1, 8000, 120,
     8000, 7680000000, 0, 0, 11),
]

# Pinned preprocess_audio results (mono mixdown + integer linear
# resample to 16 kHz) — catalog entry ``media_resample_report``
# replays (in_rate, n_in, pcm_sum) and recomputes n_out = n_in *
# 16000 // in_rate independently.  (file, codec, in_rate, n_in,
# pcm_sum — sum of the resampled int16 samples)
MEDIA_RESAMPLE_EXPECTED: list[tuple] = [
    ('chirp_mulaw.wav', 'mulaw', 8000, 160, -193992),
    ('clipped.wav', 'pcm16', 8000, 120, -22383),
    ('quiet.wav', 'pcm16', 8000, 150, -1600),
    ('tone.wav', 'pcm16', 8000, 120, -8000),
]

# Pinned per-frame dHashes of each AVI under the real RIFF demux
# (``split_avi_frames`` + ``dhash64``) — catalog entry
# ``media_scene_cuts`` replays these as VALUES and both engines compute
# the lag/hamming cut detection independently.  (file, frame_idx, dhash)
MEDIA_VIDEO_EXPECTED: list[tuple] = [
    ('clip.avi', 0, 2604529512685581718),
    ('clip.avi', 1, -7739802194356825430),
    ('clip.avi', 2, -7310799712006534445),
    ('scenes.avi', 0, 2604529512685581718),
    ('scenes.avi', 1, 2604529512685581718),
    ('scenes.avi', 2, -8070441733738985472),
    ('scenes.avi', 3, -8070441733738985472),
    ('scenes.avi', 4, 4777590422590821090),
]
