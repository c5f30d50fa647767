"""Minimal TraX v3 text-protocol implementation (tracker side).

The reference's VOT-toolkit integration (`scripts/vot.py:26-121`) relies
on the pip `trax` package for the wire protocol; that package is not
baked into this image, so the framework carries its own protocol
speaker with the same client API surface (`Server`, `Region`, `Image`,
`Rectangle`, `Polygon`, `Mask`). `cli/vot_wrapper.py` falls back to this
module when `import trax` fails.

Framing (TraX v3 text): one message per line,

    @@TRAX:<type> "<arg>" "<arg>" ... "key=value" ...

with double-quoted, backslash-escaped arguments. Message flow:

    tracker -> toolkit: hello   (capabilities as properties)
    toolkit -> tracker: initialize "<image>" "<region>"
    tracker -> toolkit: state "<region>" [properties]
    toolkit -> tracker: frame "<image>"
    tracker -> toolkit: state "<region>" [properties]
    ...
    toolkit -> tracker: quit

Region payloads: rectangle "x,y,w,h"; polygon "x1,y1,x2,y2,...";
mask "m<x>,<y>,<w>,<h>,<r1>,<r2>,..." — run lengths over the row-major
(h, w) window starting at offset (x, y), alternating zero/one runs with
the zero run first (the vot-toolkit RLE convention for masks).
"""
from __future__ import annotations

import re
import sys

import numpy as np

_PROP_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*=")


class Region:
    RECTANGLE = "rectangle"
    POLYGON = "polygon"
    MASK = "mask"


class Image:
    PATH = "path"


class Rectangle:
    def __init__(self, x, y, width, height):
        self.x, self.y = float(x), float(y)
        self.width, self.height = float(width), float(height)

    @staticmethod
    def create(x, y, width, height):
        return Rectangle(x, y, width, height)

    def bounds(self):
        return self.x, self.y, self.width, self.height

    def encode(self):
        return f"{self.x},{self.y},{self.width},{self.height}"


class Polygon:
    def __init__(self, points):
        self.points = [(float(x), float(y)) for x, y in points]

    @staticmethod
    def create(points):
        return Polygon(points)

    def __iter__(self):
        return iter(self.points)

    def encode(self):
        return ",".join(f"{x},{y}" for x, y in self.points)


class Mask:
    """Binary mask region with an (x, y) window offset."""

    def __init__(self, mask, offset=(0, 0)):
        self.mask = np.asarray(mask, np.uint8)
        self.offset = (int(offset[0]), int(offset[1]))

    @staticmethod
    def create(mask, offset=(0, 0)):
        return Mask(mask, offset)

    def array(self, full=False, size=None):
        """The mask as ndarray; full=True pads the window out to `size`
        = (width, height) when given (callers without a size get the
        window placed at its offset in a minimally-covering array)."""
        if not full and self.offset == (0, 0):
            return self.mask
        ox, oy = self.offset
        h, w = self.mask.shape
        if size is None:
            fw, fh = ox + w, oy + h
        else:
            fw, fh = size
        out = np.zeros((fh, fw), np.uint8)
        out[oy:min(oy + h, fh), ox:min(ox + w, fw)] = \
            self.mask[:max(min(oy + h, fh) - oy, 0),
                      :max(min(ox + w, fw) - ox, 0)]
        return out

    def encode(self):
        h, w = self.mask.shape
        flat = self.mask.reshape(-1).astype(np.uint8)
        # alternating run lengths, zero run first
        runs = []
        cur_val, cur_len = 0, 0
        for v in flat:
            if int(v != 0) == cur_val:
                cur_len += 1
            else:
                runs.append(cur_len)
                cur_val = int(v != 0)
                cur_len = 1
        runs.append(cur_len)
        ox, oy = self.offset
        return "m" + ",".join(
            str(v) for v in [ox, oy, w, h] + runs)


def decode_region(s: str):
    if s.startswith("m"):
        vals = [int(float(v)) for v in s[1:].split(",")]
        ox, oy, w, h = vals[:4]
        runs = vals[4:]
        flat = np.zeros((w * h,), np.uint8)
        pos, val = 0, 0
        for r in runs:
            if val:
                flat[pos:pos + r] = 1
            pos += r
            val ^= 1
        return Mask(flat.reshape(h, w), (ox, oy))
    vals = [float(v) for v in s.split(",")]
    if len(vals) == 4:
        return Rectangle(*vals)
    return Polygon(list(zip(vals[0::2], vals[1::2])))


def encode_region(region) -> str:
    if isinstance(region, (Rectangle, Polygon, Mask)):
        return region.encode()
    raise TypeError(f"not a region: {region!r}")


# ------------------------------------------------------------------
# Message framing
# ------------------------------------------------------------------

def _quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def format_message(mtype: str, args=(), properties=None) -> str:
    parts = [f"@@TRAX:{mtype}"]
    parts += [_quote(str(a)) for a in args]
    for k, v in (properties or {}).items():
        parts.append(_quote(f"{k}={v}"))
    return " ".join(parts)


def parse_message(line: str):
    """Returns (type, [args], {properties}) or None for non-TraX lines."""
    line = line.strip()
    if not line.startswith("@@TRAX:"):
        return None
    head, rest = (line.split(" ", 1) + [""])[:2]
    mtype = head[len("@@TRAX:"):]
    args, props = [], {}
    i, n = 0, len(rest)
    while i < n:
        if rest[i] == " ":
            i += 1
            continue
        if rest[i] == '"':
            j, buf = i + 1, []
            while j < n and rest[j] != '"':
                if rest[j] == "\\" and j + 1 < n:
                    buf.append(rest[j + 1])
                    j += 2
                else:
                    buf.append(rest[j])
                    j += 1
            tok = "".join(buf)
            i = j + 1
        else:
            j = rest.find(" ", i)
            j = n if j < 0 else j
            tok = rest[i:j]
            i = j
        # properties are `key=value` with a dotted-identifier key; region
        # payloads (digit-/m-prefixed) and paths (/-prefixed) never match
        if _PROP_RE.match(tok):
            k, v = tok.split("=", 1)
            props[k] = v
        else:
            args.append(tok)
    return mtype, args, props


class _ImageRef:
    def __init__(self, path):
        self._path = path

    def path(self):
        return self._path


class _Request:
    def __init__(self, rtype, region=None, image=None, properties=None):
        self.type = rtype
        self.region = region
        self.image = image or {}
        self.properties = properties or {}


class Server:
    """Tracker-side protocol endpoint (named Server for pip-trax API
    compatibility: the TRACKER serves status reports to the toolkit)."""

    def __init__(self, regions, images, channels=None, fin=None, fout=None):
        self._fin = fin or sys.stdin
        self._fout = fout or sys.stdout
        self._channels = list(channels or ["color"])
        props = {
            "trax.version": 3,
            "trax.name": "USOT-TPU",
            "trax.family": "usot_tpu",
            "trax.region": ";".join(regions),
            "trax.image": ";".join(images),
            "trax.channels": ";".join(self._channels),
        }
        self._send(format_message("hello", (), props))

    def _send(self, line: str):
        self._fout.write(line + "\n")
        self._fout.flush()

    def wait(self) -> _Request:
        while True:
            line = self._fin.readline()
            if not line:
                return _Request("quit")
            msg = parse_message(line)
            if msg is None:
                continue
            mtype, args, props = msg
            if mtype == "initialize":
                image = {c: _ImageRef(a)
                         for c, a in zip(self._channels, args[:-1])}
                return _Request("initialize", decode_region(args[-1]),
                                image, props)
            if mtype == "frame":
                image = {c: _ImageRef(a)
                         for c, a in zip(self._channels, args)}
                return _Request("frame", None, image, props)
            if mtype == "quit":
                return _Request("quit", properties=props)

    def status(self, region, properties=None):
        self._send(format_message(
            "state", (encode_region(region),), properties))

    def quit(self):
        self._send(format_message("quit"))
