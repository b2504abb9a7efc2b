"""Source fingerprinting: does an index still match its data?

Reference: FileBasedSignatureProvider.scala:30-62 — md5 over the
concatenation of each source file's (path, size, mtime).  Signature
equality is the fast path of candidate selection; on mismatch the
hybrid-scan filter falls back to file-overlap arithmetic
(rules/FileSignatureFilter.scala:108-185).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

from hyperspace_spark.metadata.entry import FileInfo


def file_based_signature(files: Iterable[FileInfo]) -> str:
    h = hashlib.md5()
    for f in sorted(files, key=lambda x: x.path):
        h.update(f"{f.path}|{f.size}|{f.mtime};".encode("utf-8"))
    return h.hexdigest()
