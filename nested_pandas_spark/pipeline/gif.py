"""GIF decoder in pure Python/NumPy — no codec library.

Completes the crawl-image codec suite (BMP/PPM/JPEG/PNG here already):
GIF87a/89a with variable-width LZW decompression, global and local
color tables, interlacing, and GCE transparency. :func:`decode_gif`
returns the FIRST frame — the right semantic for corpus features and
perceptual dedup, where an animation is represented by its poster
frame; :func:`decode_gif_frames` returns every frame with its delay for
video-style sampling.

Scale design: identical to the sibling codecs — a per-payload kernel
under Arrow-batched ``mapInPandas`` (``multimodal.decode_image``);
payload bytes never shuffle. GIF is lossless (palette indices), so
decodes are bit-reproducible and cross-validated against the JVM
ImageIO reference on real container files.

Reference context: nested-pandas has no media handling; this extends the
multimodal column policy (pipeline/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames"]


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): clear/end codes, code width grows
    after the table fills, capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_expected, np.uint8)
    n_out = 0
    # bit reader: LSB-first within bytes
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end  # truncated stream: treat as end of information
        byte0 = bitpos >> 3
        v = int.from_bytes(
            data[byte0 : byte0 + 3], "little"
        ) >> (bitpos & 7)
        bitpos += width
        return v & ((1 << width) - 1)

    # dictionary as (prefix_code, last_byte); roots are single bytes
    prefix = [0] * 4096
    suffix = [0] * 4096

    def reset():
        return clear + 2, min_code_size + 1

    next_code, width = reset()
    prev = None
    first_byte = 0
    stack = bytearray()
    while n_out < n_expected:
        code = read_code(width)
        if code == clear:
            next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("bad first LZW code in GIF data")
            out[n_out] = code
            n_out += 1
            prev, first_byte = code, code
            continue
        # expand `code` (KwKwK case: code == next_code uses prev + first)
        stack.clear()
        c = code
        if c >= next_code:
            if c != next_code:
                raise ValueError("corrupt GIF LZW code")
            stack.append(first_byte)
            c = prev
        while c >= clear:
            stack.append(suffix[c])
            c = prefix[c]
        stack.append(c)
        first_byte = c
        take = min(len(stack), n_expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            bytes(stack[::-1][:take]), np.uint8
        )
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first_byte
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_expected:
        raise ValueError(
            f"truncated GIF image data ({n_out} of {n_expected} pixels)"
        )
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    for src, dst in enumerate(rows):
        out[dst] = idx[src]
    return out


def decode_gif_frames(payload: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode every GIF frame -> list of ``((h, w, 4) uint8 RGBA,
    delay_centiseconds)``. Frames are composited onto the logical screen
    per the disposal rules (restore-to-background treated as clear)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    screen = np.zeros((h, w, 4), np.uint8)
    frames: list[tuple[np.ndarray, int]] = []
    transparent = None
    delay = 0
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, delay, tidx = struct.unpack_from(
                    "<BHB", payload, pos + 1
                )
                transparent = tidx if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("unterminated GIF extension")
                pos += 1
            else:  # skip sub-blocks
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif b == 0x2C:  # image descriptor
            x0, y0, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                table = np.frombuffer(
                    payload, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = bytearray()
            while payload[pos] != 0:
                sz = payload[pos]
                chunks += payload[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx = _lzw_decode(bytes(chunks), min_code, iw * ih).reshape(
                ih, iw
            )
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF color index out of range")
            rgba = np.concatenate(
                [table[idx], np.full((ih, iw, 1), 255, np.uint8)], axis=-1
            )
            if transparent is not None and transparent < len(table):
                rgba[idx == transparent] = screen[
                    y0 : y0 + ih, x0 : x0 + iw
                ][idx == transparent]
                rgba[..., 3][idx == transparent] = np.where(
                    screen[y0 : y0 + ih, x0 : x0 + iw, 3][
                        idx == transparent
                    ]
                    > 0,
                    255,
                    0,
                ).astype(np.uint8)
            before = screen.copy() if disposal == 3 else None
            screen[y0 : y0 + ih, x0 : x0 + iw] = rgba
            frames.append((screen.copy(), delay))
            if disposal == 2:  # restore to background: clear the region
                screen[y0 : y0 + ih, x0 : x0 + iw] = 0
            elif disposal == 3 and before is not None:
                screen = before
            transparent, delay, disposal = None, 0, 0
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02X} at byte {pos - 1}")
    if not frames:
        raise ValueError("GIF has no image frames")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST GIF frame -> ``(h, w, 3)`` uint8 RGB (GCE
    transparency composites over black)."""
    rgba = decode_gif_frames(payload)[0][0]
    a = rgba[..., 3:4].astype(np.uint16)
    rgb = (rgba[..., :3].astype(np.uint16) * a // 255).astype(np.uint8)
    return rgb
