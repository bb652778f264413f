#!/usr/bin/env python3
"""Independent CityHash128 v1.0.2 cross-check.

A from-scratch Python transcription of the published CityHash v1.0.2
algorithm (Google, MIT license — the revision ClickHouse vendors as
contrib/cityhash102 and every ClickHouse client ecosystem ports:
the pre-1.1 revision with the k3 constant, RotateByAtLeast1, the
CityMurmur <128-byte path, and the finalization WITHOUT the v1.1
`y + z` term). Written independently of the Scala implementation in
src/main/scala/graft/sink/CityHash102.scala so a transcription error
in either port shows up as a mismatch.

Usage:
  python3 tools/cityhash102_check.py            # print spec vectors
  python3 tools/cityhash102_check.py compare X  # X = file of "len:hex" lines
"""
import sys

M64 = (1 << 64) - 1

k0 = 0xc3a5c85c97cb3127
k1 = 0xb492b66fbe98f273
k2 = 0x9ae16a3b2f90404f
k3 = 0xc949d7c7509e6557
kMul = 0x9ddfea08eb382d69


def fetch64(s, i):
    return int.from_bytes(s[i:i + 8], "little")


def fetch32(s, i):
    return int.from_bytes(s[i:i + 4], "little")


def rot(v, shift):
    if shift == 0:
        return v
    return ((v >> shift) | (v << (64 - shift))) & M64


def rot_at_least_1(v, shift):
    return ((v >> shift) | (v << (64 - shift))) & M64


def shift_mix(v):
    return (v ^ (v >> 47)) & M64


def hash128_to_64(lo, hi):
    a = ((lo ^ hi) * kMul) & M64
    a ^= a >> 47
    b = ((hi ^ a) * kMul) & M64
    b ^= b >> 47
    b = (b * kMul) & M64
    return b


def hash_len_16(u, v):
    return hash128_to_64(u, v)


def hash_len_0_to_16(s, off, length):
    if length > 8:
        a = fetch64(s, off)
        b = fetch64(s, off + length - 8)
        return (hash_len_16(a, rot_at_least_1((b + length) & M64, length)) ^ b) & M64
    if length >= 4:
        a = fetch32(s, off)
        return hash_len_16((length + (a << 3)) & M64, fetch32(s, off + length - 4))
    if length > 0:
        a = s[off]
        b = s[off + (length >> 1)]
        c = s[off + length - 1]
        y = (a + (b << 8)) & 0xffffffff
        z = (length + (c << 2)) & 0xffffffff
        return (shift_mix((y * k2 ^ z * k3) & M64) * k2) & M64
    return k2


def weak_hash_len_32_with_seeds_raw(w, x, y, z, a, b):
    a = (a + w) & M64
    b = rot((b + a + z) & M64, 21)
    c = a
    a = (a + x) & M64
    a = (a + y) & M64
    b = (b + rot(a, 44)) & M64
    return ((a + z) & M64, (b + c) & M64)


def weak_hash_len_32_with_seeds(s, off, a, b):
    return weak_hash_len_32_with_seeds_raw(
        fetch64(s, off), fetch64(s, off + 8),
        fetch64(s, off + 16), fetch64(s, off + 24), a, b)


def city_murmur(s, off, length, seed_lo, seed_hi):
    a, b, c, d = seed_lo, seed_hi, 0, 0
    l = length - 16
    if l <= 0:  # len <= 16
        a = (shift_mix((a * k1) & M64) * k1) & M64
        c = (b * k1 + hash_len_0_to_16(s, off, length)) & M64
        d = shift_mix((a + (fetch64(s, off) if length >= 8 else c)) & M64)
    else:  # len > 16
        c = hash_len_16((fetch64(s, off + length - 8) + k1) & M64, a)
        d = hash_len_16((b + length) & M64,
                        (c + fetch64(s, off + length - 16)) & M64)
        a = (a + d) & M64
        p = off
        while True:
            a ^= (shift_mix((fetch64(s, p) * k1) & M64) * k1) & M64
            a = (a * k1) & M64
            b ^= a
            c ^= (shift_mix((fetch64(s, p + 8) * k1) & M64) * k1) & M64
            c = (c * k1) & M64
            d ^= c
            p += 16
            l -= 16
            if l <= 0:
                break
    a = hash_len_16(a, c)
    b = hash_len_16(d, b)
    return ((a ^ b) & M64, hash_len_16(b, a))


def city_hash_128_with_seed(s, off, length, seed_lo, seed_hi):
    if length < 128:
        return city_murmur(s, off, length, seed_lo, seed_hi)
    x, y = seed_lo, seed_hi
    z = (length * k1) & M64
    v0 = (rot((y ^ k1) & M64, 49) * k1 + fetch64(s, off)) & M64
    v1 = (rot(v0, 42) * k1 + fetch64(s, off + 8)) & M64
    w0 = (rot((y + z) & M64, 35) * k1 + x) & M64
    w1 = (rot((x + fetch64(s, off + 88)) & M64, 53) * k1) & M64
    p = off
    rem = length
    while rem >= 128:
        for _ in range(2):
            x = (rot((x + y + v0 + fetch64(s, p + 16)) & M64, 37) * k1) & M64
            y = (rot((y + v1 + fetch64(s, p + 48)) & M64, 42) * k1) & M64
            x ^= w1
            y ^= v0
            z = rot((z ^ w0) & M64, 33)
            v0, v1 = weak_hash_len_32_with_seeds(s, p, (v1 * k1) & M64,
                                                 (x + w0) & M64)
            w0, w1 = weak_hash_len_32_with_seeds(s, p + 32, (z + w1) & M64, y)
            z, x = x, z
            p += 64
        rem -= 128
    y = (y + rot(w0, 37) * k0 + z) & M64
    x = (x + rot((v0 + z) & M64, 49) * k0) & M64
    tail_done = 0
    while tail_done < rem:
        tail_done += 32
        y = (rot((y - x) & M64, 42) * k0 + v1) & M64
        w0 = (w0 + fetch64(s, p + rem - tail_done + 16)) & M64
        x = (rot(x, 49) * k0 + w0) & M64
        w0 = (w0 + v0) & M64
        v0, v1 = weak_hash_len_32_with_seeds(s, p + rem - tail_done, v0, w0)
    x = hash_len_16(x, v0)
    y = hash_len_16(y, w0)
    # v1.0.2 finalization: LOW word pairs (x + v.second) with w.FIRST —
    # identical in every published revision (1.0 through 1.1)
    return ((hash_len_16((x + v1) & M64, w0) + y) & M64,
            hash_len_16((x + w1) & M64, (y + v1) & M64))


def city_hash_128(s):
    length = len(s)
    if length >= 16:
        return city_hash_128_with_seed(
            s, 16, length - 16, fetch64(s, 0) ^ k3, fetch64(s, 8))
    if length >= 8:
        return city_hash_128_with_seed(
            b"", 0, 0,
            (fetch64(s, 0) ^ ((length * k0) & M64)) & M64,
            (fetch64(s, length - 8) ^ k1) & M64)
    return city_hash_128_with_seed(s, 0, length, k0, k1)


SPEC_LENS = [0, 3, 5, 8, 15, 16, 63, 143, 144, 200, 300, 1024]


def spec_buf(n):
    return bytes(((i * 31 + 11) & 0xff) for i in range(n))


def vectors():
    out = []
    for n in SPEC_LENS:
        lo, hi = city_hash_128(spec_buf(n))
        out.append(f"{n}:{lo:016x}{hi:016x}")
    return out


if __name__ == "__main__":
    vs = vectors()
    if len(sys.argv) > 2 and sys.argv[1] == "compare":
        theirs = [l.strip() for l in open(sys.argv[2]) if l.strip()]
        ok = vs == theirs
        for a, b in zip(vs, theirs):
            print(("OK  " if a == b else "DIFF") + f" py={a} other={b}")
        sys.exit(0 if ok else 1)
    for v in vs:
        print(v)
