"""Pure-python AES (FIPS-197) + CBC mode, for the PDF standard security
handler's AESV2/AESV3 crypt filters (PDF 32000-1 §7.6.2: CBC with a
16-byte IV prepended to the ciphertext and PKCS#5 padding).

The sandbox image has no ``cryptography``/``pycryptodome``; document
decryption is KB-scale leaf work inside the extraction UDF, so a table
implementation is fast enough. Tables are generated from the GF(2^8)
arithmetic at import (less error-prone than transcribing 256
constants); correctness anchors to the FIPS-197 appendix C known-answer
vectors in tests.
"""

from __future__ import annotations


def _build_tables():
    # GF(2^8) exp/log over generator 3 (x+1)
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        xt = ((x << 1) & 0xFF) ^ (0x1B if x & 0x80 else 0)
        x = xt ^ x  # multiply by 3
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[i] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox, gmul


_SBOX, _INV_SBOX, _GMUL = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> list[list[int]]:
    """Key schedule -> one 16-int round key per round (Nr+1 of them)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [
        [words[4 * r + c][j] for c in range(4) for j in range(4)]
        for r in range(nr + 1)
    ]


def _add_round_key(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


# state layout: state[4*col + row] (column-major, matching the key words)
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, rks[0])
    nr = len(rks) - 1
    for rnd in range(1, nr):
        s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]  # SubBytes+ShiftRows
        ns = [0] * 16
        for c in range(4):
            a = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = _GMUL(a[0], 2) ^ _GMUL(a[1], 3) ^ a[2] ^ a[3]
            ns[4 * c + 1] = a[0] ^ _GMUL(a[1], 2) ^ _GMUL(a[2], 3) ^ a[3]
            ns[4 * c + 2] = a[0] ^ a[1] ^ _GMUL(a[2], 2) ^ _GMUL(a[3], 3)
            ns[4 * c + 3] = _GMUL(a[0], 3) ^ a[1] ^ a[2] ^ _GMUL(a[3], 2)
        s = ns
        _add_round_key(s, rks[rnd])
    s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
    _add_round_key(s, rks[nr])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    nr = len(rks) - 1
    _add_round_key(s, rks[nr])
    for rnd in range(nr - 1, 0, -1):
        s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        _add_round_key(s, rks[rnd])
        ns = [0] * 16
        for c in range(4):
            a = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = _GMUL(a[0], 14) ^ _GMUL(a[1], 11) ^ _GMUL(a[2], 13) ^ _GMUL(a[3], 9)
            ns[4 * c + 1] = _GMUL(a[0], 9) ^ _GMUL(a[1], 14) ^ _GMUL(a[2], 11) ^ _GMUL(a[3], 13)
            ns[4 * c + 2] = _GMUL(a[0], 13) ^ _GMUL(a[1], 9) ^ _GMUL(a[2], 14) ^ _GMUL(a[3], 11)
            ns[4 * c + 3] = _GMUL(a[0], 11) ^ _GMUL(a[1], 13) ^ _GMUL(a[2], 9) ^ _GMUL(a[3], 14)
        s = ns
    s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
    _add_round_key(s, rks[0])
    return bytes(s)


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encrypt (the FIPS-197 known-answer surface)."""
    return _encrypt_block(block, _expand_key(key))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with PKCS#5/7 padding; returns iv + ciphertext (the
    PDF §7.6.2 stream layout)."""
    rks = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """CBC decrypt of iv-prefixed ciphertext, PKCS#5/7 padding removed.
    Raises ValueError on malformed length or padding — callers flag."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC data must be iv + non-empty 16-byte blocks")
    rks = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        dec = _decrypt_block(blk, rks)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding")
    return bytes(out[:-pad])
