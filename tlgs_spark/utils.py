"""Misc helpers: reference-parity content hash.

The reference hashes page content with XXH64 seed 0 and renders the
u64 as an uppercase hex string (tlgsutils/utils.cpp:121-125; golden
value pinned at tests/utils_test.cpp:146-149:
xxHash64("Hello, World!") == "C49AACF8080FE47F").

Spark's built-in ``xxhash64()`` is the same XXH64 algorithm but with
seed 42, so the bulk change-detection column (docs.text_hash) uses the
JVM-side builtin (any stable 64-bit hash works for change detection),
while this pure-Python seed-0 implementation provides bit parity with
the reference where tests demand it.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 (reference algorithm, default seed 0)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxhash64_hex(data: bytes | str, seed: int = 0) -> str:
    """Reference rendering: uppercase hex of the u64 (utils.cpp:121-125)."""
    return f"{xxhash64(data, seed):016X}"


def hex_to_u64(s: str) -> int:
    """F10: stoull(hash, 16) analog (search.cpp:476). Spark column
    form: ``conv(col, 16, 10).cast('decimal(20,0)')`` or keep the hash
    as a long end-to-end (what this engine does)."""
    return int(s, 16)


def parse_mime(meta: str) -> tuple[str, dict[str, str]]:
    """F21: ``type/subtype; k=v; ...`` → (mime, params), keys
    lowercased, values stripped of quotes (crawler.cpp:61-88 analog).
    Spark column form: split + str_to_map."""
    parts = [p.strip() for p in meta.split(";")]
    mime = parts[0].lower()
    params: dict[str, str] = {}
    for p in parts[1:]:
        if "=" in p:
            k, _, v = p.partition("=")
            params[k.strip().lower()] = v.strip().strip('"')
    return mime, params


# --- Spark conf byte-size strings -----------------------------------------

_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def parse_byte_size(s, default=None):
    """Spark byte-size conf value → bytes. Accepts the same grammar as
    Spark's JavaUtils.byteStringAsBytes for the conf keys this engine
    reads ('134217728', '128m', '64MB', '1g'; bare numbers are bytes).
    Returns ``default`` when unparseable — each caller picks the SAFE
    direction (a perf-sizing knob takes Spark's documented default; a
    correctness gate fails closed and takes the slow path)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", str(s))
    if not m:
        return default
    mult = _BYTE_SUFFIX.get(m.group(2).lower())
    if mult is None:
        return default
    return int(m.group(1)) * mult
