"""ctypes bindings for the native metric library (libnavc_metrics.so).

Builds lazily via make on first use if the shared object is missing and a
compiler is available; all callers fall back to the pure-Python
implementations when unavailable.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "build", "libnavc_metrics.so")
_lib = None
_tried = False


def _build() -> bool:
    """Serialized across processes: the test suite and multi-host runs spawn
    real multi-process clusters, and two concurrent `make` invocations write
    the same .so non-atomically (one process could dlopen a half-linked
    file and silently fall back to the Python scorers)."""
    try:
        import fcntl
        os.makedirs(os.path.join(_HERE, "build"), exist_ok=True)
        with open(os.path.join(_HERE, "build", ".lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if not os.path.exists(_SO):
                    subprocess.run(["make", "-C", _HERE], check=True,
                                   capture_output=True, timeout=120)
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)
        return os.path.exists(_SO)
    except Exception:
        return False


def _all_ascii(*corpora: Dict[str, List[str]]) -> bool:
    return all(s.isascii()
               for corpus in corpora
               for caps in corpus.values()
               for s in caps)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.navc_tokenize.restype = ctypes.c_void_p
        lib.navc_tokenize.argtypes = [ctypes.c_char_p]
        lib.navc_bleu_corpus.restype = ctypes.c_void_p
        lib.navc_bleu_corpus.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int)]
        lib.navc_cider_corpus.restype = ctypes.c_void_p
        lib.navc_cider_corpus.argtypes = lib.navc_bleu_corpus.argtypes
        lib.navc_rouge_corpus.restype = ctypes.c_void_p
        lib.navc_rouge_corpus.argtypes = lib.navc_bleu_corpus.argtypes
        lib.navc_meteor_corpus.restype = ctypes.c_void_p
        lib.navc_meteor_corpus.argtypes = lib.navc_bleu_corpus.argtypes
        lib.navc_porter_stem.restype = ctypes.c_void_p
        lib.navc_porter_stem.argtypes = [ctypes.c_char_p]
        lib.navc_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _take_string(lib, ptr) -> str:
    try:
        return ctypes.cast(ptr, ctypes.c_char_p).value.decode("utf-8")
    finally:
        lib.navc_free(ptr)


def tokenize(text: str) -> List[str]:
    # the C++ pipeline is byte-wise (ASCII tolower / isalnum): non-ASCII
    # text would tokenize differently from the Python oracle (e.g. 'CAFÉ'
    # keeps an uppercase É, UTF-8 bytes break the \\b contraction guards) —
    # route those strings to the Python implementation
    if not text.isascii():
        from ..metrics.tokenizer import ptb_tokenize
        return ptb_tokenize(text)
    lib = get_lib()
    assert lib is not None
    ptr = lib.navc_tokenize(text.encode("utf-8"))
    out = _take_string(lib, ptr)
    return out.split() if out else []


def _pack_corpus(hyps: Dict[str, List[str]], refs: Dict[str, List[str]]):
    vids = list(hyps.keys())
    hyp_arr = (ctypes.c_char_p * len(vids))(
        *[hyps[v][0].encode("utf-8") for v in vids])
    flat_refs: List[bytes] = []
    offsets = [0]
    for v in vids:
        flat_refs.extend(r.encode("utf-8") for r in refs[v])
        offsets.append(len(flat_refs))
    ref_arr = (ctypes.c_char_p * len(flat_refs))(*flat_refs)
    off_arr = (ctypes.c_int * len(offsets))(*offsets)
    return vids, hyp_arr, ref_arr, off_arr


def bleu_corpus(hyps: Dict[str, List[str]], refs: Dict[str, List[str]]
                ) -> List[float]:
    if not _all_ascii(hyps, refs):  # ASCII-only C++ path; see tokenize()
        from ..metrics.bleu import corpus_bleu
        return list(corpus_bleu(hyps, refs)[0])
    lib = get_lib()
    assert lib is not None
    vids, hyp_arr, ref_arr, off_arr = _pack_corpus(hyps, refs)
    ptr = lib.navc_bleu_corpus(hyp_arr, len(vids), ref_arr, off_arr)
    return json.loads(_take_string(lib, ptr))


def cider_corpus(hyps: Dict[str, List[str]], refs: Dict[str, List[str]]
                 ) -> Tuple[float, List[float]]:
    if not _all_ascii(hyps, refs):
        from ..metrics.cider import corpus_cider
        return corpus_cider(hyps, refs)
    lib = get_lib()
    assert lib is not None
    vids, hyp_arr, ref_arr, off_arr = _pack_corpus(hyps, refs)
    ptr = lib.navc_cider_corpus(hyp_arr, len(vids), ref_arr, off_arr)
    arr = json.loads(_take_string(lib, ptr))
    return arr[0], arr[1:]


def _mean_per_image(fn_name: str, hyps, refs) -> Tuple[float, List[float]]:
    lib = get_lib()
    assert lib is not None
    vids, hyp_arr, ref_arr, off_arr = _pack_corpus(hyps, refs)
    ptr = getattr(lib, fn_name)(hyp_arr, len(vids), ref_arr, off_arr)
    arr = json.loads(_take_string(lib, ptr))
    return arr[0], arr[1:]


def rouge_corpus(hyps, refs) -> Tuple[float, List[float]]:
    if not _all_ascii(hyps, refs):
        from ..metrics.rouge import corpus_rouge_l
        return corpus_rouge_l(hyps, refs)
    return _mean_per_image("navc_rouge_corpus", hyps, refs)


def meteor_corpus(hyps, refs) -> Tuple[float, List[float]]:
    if not _all_ascii(hyps, refs):
        from ..metrics.meteor import corpus_meteor
        return corpus_meteor(hyps, refs)
    return _mean_per_image("navc_meteor_corpus", hyps, refs)


def porter_stem(word: str) -> str:
    lib = get_lib()
    assert lib is not None
    return _take_string(lib, lib.navc_porter_stem(word.encode("utf-8")))
