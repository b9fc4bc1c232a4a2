"""Language-modeling datamodule (≙ reference
training/src/datamodules/language_modeling_hf.py + lm_dataset.py +
fault_tolerant_sampler.py).

The reference tokenizes a HF dataset, concatenates into one flat uint16
token array cached on disk, then serves fixed (seqlen+1) windows through
torch DataLoader workers with a fault-tolerant shuffled sampler. Here the
cache format is the same (a flat .bin of uint16/uint32 tokens) and the
serving hot path is native: csrc/dataloader/dataloader.cpp mmaps the token
file and gathers shuffled windows straight into a numpy buffer through a C
ABI (built on demand with g++; a pure-numpy fallback keeps tests hermetic).

Exact resume (≙ RandomFaultTolerantSampler's RNG checkpointing) needs only
the integer `step` — batch i of epoch e is a pure function of (seed, e, i)
via the loader's Feistel permutation.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["TokenDataset", "LMDataModule", "build_token_cache"]

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "dataloader" / "dataloader.cpp"


def _build_native() -> Optional[ctypes.CDLL]:
    """Compile the C++ loader once per environment (cached .so)."""
    cache_dir = Path(
        os.environ.get("XFA_CACHE_DIR", Path.home() / ".cache" / "xfa_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so = cache_dir / "libxfa_dataloader.so"
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(so), "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.dl_open.restype = ctypes.c_void_p
        lib.dl_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int64]
        lib.dl_num_sequences.restype = ctypes.c_int64
        lib.dl_num_sequences.argtypes = [ctypes.c_void_p]
        lib.dl_num_tokens.restype = ctypes.c_int64
        lib.dl_num_tokens.argtypes = [ctypes.c_void_p]
        lib.dl_fetch.restype = ctypes.c_int
        lib.dl_fetch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.dl_close.argtypes = [ctypes.c_void_p]
        return lib
    except Exception:
        return None


_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _build_native()
        _LIB_TRIED = True
    return _LIB


_M64 = (1 << 64) - 1


def _mix64(x: int) -> int:
    """splitmix64 finalizer on plain ints (mirrors the C++ mix())."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def _feistel_perm_np(i: int, n: int, seed: int) -> int:
    """Python mirror of the C++ permutation (fallback + testing)."""
    if n <= 1:
        return 0
    bits = 1
    while (1 << bits) < n:
        bits += 1
    half = (bits + 1) // 2
    mask = (1 << half) - 1
    x = i
    while True:
        l, r = x >> half, x & mask
        for rnd in range(4):
            f = _mix64(r ^ _mix64((seed + rnd) & _M64)) & mask
            l, r = r, l ^ f
        x = (l << half) | r
        if x < n:
            return x


class TokenDataset:
    """Fixed-window views over a flat token file, shuffled resumably."""

    def __init__(self, path: str | os.PathLike, seqlen: int,
                 dtype: np.dtype = np.uint16, seed: int = 0,
                 use_native: Optional[bool] = None):
        self.path = str(path)
        self.seqlen = int(seqlen)
        self.dtype = np.dtype(dtype)
        self.seed = int(seed)
        assert self.dtype.itemsize in (2, 4), self.dtype
        self._handle = None
        lib = _lib() if (use_native is None or use_native) else None
        if lib is not None:
            h = lib.dl_open(self.path.encode(), self.dtype.itemsize,
                            self.seqlen)
            if h:
                self._handle = h
                self._lib = lib
        if self._handle is None:
            if use_native:
                raise RuntimeError("native dataloader unavailable")
            self._tokens = np.memmap(self.path, dtype=self.dtype, mode="r")

    @property
    def num_sequences(self) -> int:
        if self._handle is not None:
            return int(self._lib.dl_num_sequences(self._handle))
        return len(self._tokens) // (self.seqlen + 1)

    def fetch(self, start: int, batch: int, threads: int = 0) -> np.ndarray:
        """Windows at global shuffled indices [start, start+batch):
        (batch, seqlen+1) int32. Pure function of (seed, start)."""
        out = np.empty((batch, self.seqlen + 1), np.int32)
        if self._handle is not None:
            rc = self._lib.dl_fetch(
                self._handle, self.seed, start, batch,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), threads,
            )
            if rc != 0:
                raise RuntimeError("dl_fetch failed")
            return out
        n = self.num_sequences
        w = self.seqlen + 1
        for b in range(batch):
            g = start + b
            epoch, idx = divmod(g, n)
            pos = _feistel_perm_np(
                idx, n, self.seed + 0x51ED2701 * epoch
            )
            out[b] = self._tokens[pos * w:(pos + 1) * w]
        return out

    def close(self):
        if self._handle is not None:
            self._lib.dl_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def build_token_cache(texts, tokenizer, out_path, dtype=np.uint16,
                      append_eos: bool = True) -> str:
    """Tokenize + concatenate into a flat binary cache
    (≙ language_modeling_hf.py's .bin cache built with datasets.map)."""
    eos = getattr(tokenizer, "eos_token_id", None)
    with open(out_path, "wb") as f:
        for text in texts:
            ids = tokenizer(text)["input_ids"] if callable(tokenizer) else \
                tokenizer.encode(text)
            if append_eos and eos is not None:
                ids = list(ids) + [eos]
            np.asarray(ids, dtype=dtype).tofile(f)
    return str(out_path)


@dataclasses.dataclass
class LMDataModule:
    """Batched iterator with exact-resume state (≙ the reference
    datamodule + fault-tolerant sampler pair)."""

    path: str
    seqlen: int
    batch_size: int
    seed: int = 0
    dtype: np.dtype = np.uint16
    step: int = 0  # resumable cursor: batches served so far

    def __post_init__(self):
        self.dataset = TokenDataset(self.path, self.seqlen, self.dtype,
                                    self.seed)

    def state_dict(self) -> dict:
        return {"step": self.step, "seed": self.seed}

    def load_state_dict(self, state: dict):
        self.step = int(state["step"])
        assert int(state["seed"]) == self.seed, "seed mismatch on resume"

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            batch = self.dataset.fetch(self.step * self.batch_size,
                                       self.batch_size)
            self.step += 1
            yield batch[:, :-1], batch[:, 1:]
