#!/usr/bin/env python
"""Kaldi binary archive (ark/scp) matrix & vector IO.

Replaces the kaldi_python_io dependency of the reference
(/root/reference/aps/loader/am/kaldi.py, aps/transform/asr.py:29). Supports
binary float/double matrices ("FM"/"DM") and vectors ("FV"/"DV"), scp files
with "path:offset" values, and writing (ark[,scp]) pairs."""

import struct
from typing import IO, Tuple

import numpy as np

from aps_tpu.io.base import BaseReader


def _expect(fd: IO, token: bytes):
    got = fd.read(len(token))
    if got != token:
        raise RuntimeError(f"Expected token {token!r}, got {got!r}")


def _read_int32(fd: IO) -> int:
    size = fd.read(1)[0]
    if size != 4:
        raise RuntimeError(f"Unsupported int size: {size}")
    return struct.unpack("<i", fd.read(4))[0]


def read_binary_mat(fd: IO) -> np.ndarray:
    """Read one kaldi binary matrix/vector at the current offset."""
    _expect(fd, b"\0B")
    token = b""
    while not token.endswith(b" "):
        token += fd.read(1)
    token = token.strip()
    if token in (b"FM", b"DM"):
        rows = _read_int32(fd)
        cols = _read_int32(fd)
        dtype = "<f4" if token == b"FM" else "<f8"
        data = np.frombuffer(fd.read(rows * cols * int(dtype[-1])),
                             dtype=dtype)
        return data.reshape(rows, cols).astype(np.float32)
    if token in (b"FV", b"DV"):
        dim = _read_int32(fd)
        dtype = "<f4" if token == b"FV" else "<f8"
        data = np.frombuffer(fd.read(dim * int(dtype[-1])), dtype=dtype)
        return data.astype(np.float32)
    raise RuntimeError(f"Unsupported kaldi object type: {token!r} "
                       "(compressed matrices are not supported)")


def read_kaldi_mat(path: str) -> np.ndarray:
    """Read a single-object ark file or "ark:offset" location."""
    if ":" in path and path.rsplit(":", 1)[1].isdigit():
        fname, offset = path.rsplit(":", 1)
        with open(fname, "rb") as fd:
            fd.seek(int(offset))
            return read_binary_mat(fd)
    with open(path, "rb") as fd:
        # archives hold "key <obj>" pairs; single-object files start with \0B
        head = fd.read(2)
        fd.seek(0)
        if head == b"\0B":
            return read_binary_mat(fd)
        _read_key(fd)
        return read_binary_mat(fd)


def _read_key(fd: IO) -> str:
    key = b""
    while True:
        c = fd.read(1)
        if not c:
            return ""
        if c == b" ":
            return key.decode()
        key += c


def write_binary_mat(fd: IO, mat: np.ndarray) -> int:
    """Write one kaldi float32 matrix/vector; return its value offset."""
    offset = fd.tell()
    fd.write(b"\0B")
    mat = np.asarray(mat, dtype=np.float32)
    if mat.ndim == 2:
        fd.write(b"FM ")
        fd.write(b"\4" + struct.pack("<i", mat.shape[0]))
        fd.write(b"\4" + struct.pack("<i", mat.shape[1]))
    elif mat.ndim == 1:
        fd.write(b"FV ")
        fd.write(b"\4" + struct.pack("<i", mat.shape[0]))
    else:
        raise RuntimeError(f"Expect 1/2D array, got {mat.ndim}")
    fd.write(mat.astype("<f4").tobytes())
    return offset


class ScriptReader(BaseReader):
    """feats.scp reader: values are "/path/feats.ark:offset"."""

    def __init__(self, scp_path: str):
        super(ScriptReader, self).__init__(scp_path, num_tokens=2)
        self.mngr = {}

    def _load(self, key: str) -> np.ndarray:
        value = self.index_dict[key]
        fname, offset = value.rsplit(":", 1)
        if fname not in self.mngr:
            self.mngr[fname] = open(fname, "rb")
        fd = self.mngr[fname]
        fd.seek(int(offset))
        return read_binary_mat(fd)


class ArchiveReader(object):
    """Sequential reader over a kaldi ark of matrices."""

    def __init__(self, ark_path: str):
        self.ark_path = ark_path

    def __iter__(self):
        with open(self.ark_path, "rb") as fd:
            while True:
                key = _read_key(fd)
                if not key:
                    break
                yield key, read_binary_mat(fd)


class ArchiveWriter(object):
    """Write "key matrix" pairs to ark (+scp index)."""

    def __init__(self, ark_path: str, scp_path: str = ""):
        self.ark_path = ark_path
        self.scp_path = scp_path

    def __enter__(self):
        self.ark_fd = open(self.ark_path, "wb")
        self.scp_fd = open(self.scp_path, "w") if self.scp_path else None
        return self

    def write(self, key: str, mat: np.ndarray):
        self.ark_fd.write(key.encode() + b" ")
        offset = write_binary_mat(self.ark_fd, mat)
        if self.scp_fd:
            self.scp_fd.write(f"{key} {self.ark_path}:{offset}\n")

    def __exit__(self, *args):
        self.ark_fd.close()
        if self.scp_fd:
            self.scp_fd.close()
