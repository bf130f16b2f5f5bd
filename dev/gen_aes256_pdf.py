#!/usr/bin/env python3
"""Generate minimal AES-256 (R5/R6) encrypted PDF fixtures.

Independent implementation of ISO 32000-2 §7.6.4 (Algorithms 2.B, 8, 9, 10)
on top of `cryptography` + `hashlib` — deliberately NOT a mirror of the Scala
reader, so a shared bug cannot self-verify. Deterministic: salts/IVs derive
from SHA-256 of fixed labels.

Outputs (src/test/resources/graft/pdf/):
  aes256-r6-password.pdf  user password "graft", owner "owner-secret"
  aes256-r6-empty.pdf     empty user password (copy-protection style)
  aes256-r5-empty.pdf     deprecated R5 (single SHA-256 round), empty user pw
"""
import hashlib
import os
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "pdf")


def det_bytes(label: str, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"graft-aes256-{label}-{i}".encode()).digest()
        i += 1
    return out[:n]


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(data) + enc.finalize()


def hash_2b(pw: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """Algorithm 2.B (R6); a single SHA-256 round for R5."""
    k = hashlib.sha256(pw + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def build_encryption(user_pw: str, owner_pw: str, label: str, r: int):
    """Algorithms 8/9/10: returns (file_key, U, UE, O, OE, Perms)."""
    file_key = det_bytes(f"{label}-filekey", 32)
    upw = user_pw.encode("utf-8")[:127]
    opw = owner_pw.encode("utf-8")[:127]
    uvs, uks = det_bytes(f"{label}-uvs", 8), det_bytes(f"{label}-uks", 8)
    u = hash_2b(upw, uvs, b"", r) + uvs + uks
    ue = aes_cbc_encrypt(hash_2b(upw, uks, b"", r), b"\0" * 16, file_key)
    ovs, oks = det_bytes(f"{label}-ovs", 8), det_bytes(f"{label}-oks", 8)
    o = hash_2b(opw, ovs, u, r) + ovs + oks
    oe = aes_cbc_encrypt(hash_2b(opw, oks, u, r), b"\0" * 16, file_key)
    p = -4 & 0xFFFFFFFF
    perms_clear = (p.to_bytes(4, "little") + b"\xff\xff\xff\xff" + b"T" +
                   b"adb" + det_bytes(f"{label}-perms", 4))
    perms = aes_ecb_encrypt(file_key, perms_clear)
    return file_key, u, ue, o, oe, perms


def encrypt_stream(file_key: bytes, label: str, data: bytes) -> bytes:
    iv = det_bytes(f"{label}-iv", 16)
    pad = 16 - len(data) % 16
    return iv + aes_cbc_encrypt(file_key, iv, data + bytes([pad]) * pad)


def hexstr(b: bytes) -> str:
    return "<" + b.hex().upper() + ">"


def build_pdf(path: str, user_pw: str, r: int, text: str):
    label = os.path.basename(path)
    file_key, u, ue, o, oe, perms = build_encryption(
        user_pw, "owner-secret", label, r)
    content = f"BT /F1 12 Tf 72 700 Td ({text}) Tj ET".encode()
    enc_content = encrypt_stream(file_key, label, content)
    objs = []
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    objs.append(b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
                b"/MediaBox [0 0 612 792] /Contents 4 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    objs.append(b"4 0 obj\n<< /Length " + str(len(enc_content)).encode() +
                b" >>\nstream\n" + enc_content + b"\nendstream\nendobj\n")
    objs.append(b"5 0 obj\n<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>\nendobj\n")
    enc_dict = (
        "6 0 obj\n<< /Filter /Standard /V 5 /R " + str(r) +
        " /Length 256 /P -4 /EncryptMetadata true" +
        " /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>" +
        " /StmF /StdCF /StrF /StdCF" +
        " /U " + hexstr(u) + " /UE " + hexstr(ue) +
        " /O " + hexstr(o) + " /OE " + hexstr(oe) +
        " /Perms " + hexstr(perms) + " >>\nendobj\n").encode()
    objs.append(enc_dict)

    body = b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"
    offsets = []
    for ob in objs:
        offsets.append(len(body))
        body += ob
    xref_at = len(body)
    xref = b"xref\n0 7\n0000000000 65535 f \n"
    for off in offsets:
        xref += f"{off:010d} 00000 n \n".encode()
    fid = det_bytes(f"{label}-id", 16).hex().upper()
    trailer = (f"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R "
               f"/ID [<{fid}> <{fid}>] >>\nstartxref\n{xref_at}\n"
               f"%%EOF\n").encode()
    with open(path, "wb") as f:
        f.write(body + xref + trailer)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, R{r}, "
          f"user_pw={user_pw!r})")


def main():
    os.makedirs(OUT, exist_ok=True)
    build_pdf(os.path.join(OUT, "aes256-r6-password.pdf"), "graft", 6,
              "AES-256 R6 secured text")
    build_pdf(os.path.join(OUT, "aes256-r6-empty.pdf"), "", 6,
              "AES-256 R6 copy-protected text")
    build_pdf(os.path.join(OUT, "aes256-r5-empty.pdf"), "", 5,
              "AES-256 R5 legacy text")


if __name__ == "__main__":
    main()
