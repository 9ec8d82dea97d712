"""Magic-byte MIME classification: prefix trie + compiled NumPy tables.

Re-creation (from scratch, Spark-first) of the reference's byte-signature
classifier:

* ``MimeTypeTrie`` mirrors the semantics of the C# trie
  (reference ``Nolock.social.OCRservices.Core/Utils/MimeTypeTrie.cs:3-79``):
  ``add`` inserts a byte signature -> MIME (conflicting re-insert raises,
  ``MimeTypeTrie.cs:13-34``); ``search`` walks the payload byte-by-byte,
  remembers the deepest node carrying a MIME (longest-prefix match) and
  early-exits on the first missing edge (``MimeTypeTrie.cs:36-58``);
  ``get_all_mime_types`` enumerates every stored MIME
  (``MimeTypeTrie.cs:60-79``).

* ``CompiledTrie`` is the scale path: the trie is compiled ONCE on the
  driver into flat NumPy tables — ``transitions[state, byte] -> state``
  and ``emit[state] -> mime_id`` — that are broadcast to executors and
  applied to whole Arrow batches with a fixed number of vectorized steps
  (max signature length, not payload length).  No per-row Python runs in
  the hot path; this is the vectorized equivalent of the reference's
  early-exit scan (``MimeTypeTrie.cs:44-47``) because only the first
  ``max_depth`` bytes of each payload are ever examined.

Production signature tables reproduce the reference exactly:

* strict 5-format table  — ``PipelineNodeImageToUrl.cs:11-20`` (unknown
  signature raises, listing supported types, ``:38-48``);
* lenient 11-signature table — ``OcrRequestHandler.cs:120-139`` (unknown
  falls back to ``application/octet-stream``, ``:115-118``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

OCTET_STREAM = "application/octet-stream"


class MimeTypeTrie:
    """Byte-prefix trie with longest-prefix-match search."""

    __slots__ = ("_root", "_count")

    def __init__(self) -> None:
        # node = (children: dict[int, node], mime: str | None) — stored as a
        # 2-item list so mime can be assigned after creation.
        self._root: list = [{}, None]
        self._count = 0

    def add(self, signature: bytes, mime_type: str) -> None:
        """Insert signature -> mime.

        Re-inserting the same signature with a *different* MIME raises
        (mirrors the conflict behavior tested in MimeTypeTrieTests.cs:49-62).
        """
        if signature is None:
            raise ValueError("signature must not be None")
        if mime_type is None or not mime_type.strip():
            raise ValueError("mime_type must be a non-empty string")
        if len(signature) == 0:
            raise ValueError("signature must not be empty")
        node = self._root
        for b in signature:
            node = node[0].setdefault(b, [{}, None])
        if node[1] is not None and node[1] != mime_type:
            raise ValueError(
                f"conflicting MIME for signature {signature.hex()}: "
                f"{node[1]!r} vs {mime_type!r}"
            )
        if node[1] is None:
            node[1] = mime_type
            self._count += 1

    def search(self, data: bytes | None) -> str | None:
        """Longest-prefix match; None when no stored signature prefixes data."""
        if not data:
            return None
        node = self._root
        found = None
        for b in data:
            child = node[0].get(b)
            if child is None:
                break  # early exit on first missing edge
            node = child
            if node[1] is not None:
                found = node[1]  # deepest (longest) match wins
        return found

    def get_all_mime_types(self) -> list[str]:
        """All stored MIME types (DFS order, deduplicated, sorted)."""
        out: set[str] = set()
        stack = [self._root]
        while stack:
            node = stack.pop()
            if node[1] is not None:
                out.add(node[1])
            stack.extend(node[0].values())
        return sorted(out)

    def __len__(self) -> int:
        return self._count

    def signatures(self) -> list[tuple[bytes, str]]:
        """All stored (signature, mime) pairs (DFS, deterministic order)."""
        out: list[tuple[bytes, str]] = []
        stack: list[tuple[bytes, list]] = [(b"", self._root)]
        while stack:
            prefix, node = stack.pop()
            if node[1] is not None:
                out.append((prefix, node[1]))
            for b in sorted(node[0], reverse=True):
                stack.append((prefix + bytes([b]), node[0][b]))
        return out

    # -- compilation ------------------------------------------------------

    def compile(self) -> "CompiledTrie":
        """Flatten into NumPy transition/emit tables (driver-side, once)."""
        # BFS assign state ids; state 0 = root.
        nodes = [self._root]
        ids: dict[int, int] = {id(self._root): 0}
        i = 0
        while i < len(nodes):
            for child in nodes[i][0].values():
                if id(child) not in ids:
                    ids[id(child)] = len(nodes)
                    nodes.append(child)
            i += 1
        n = len(nodes)
        transitions = np.full((n, 256), -1, dtype=np.int32)
        emit = np.full(n, -1, dtype=np.int32)
        mimes: list[str] = []
        mime_ids: dict[str, int] = {}
        max_depth = 0

        def depth_of(node_idx: int, seen_depths: dict[int, int]) -> int:
            return seen_depths[node_idx]

        depths = {0: 0}
        for idx, node in enumerate(nodes):
            for b, child in node[0].items():
                cidx = ids[id(child)]
                transitions[idx, b] = cidx
                depths[cidx] = depths[idx] + 1
                max_depth = max(max_depth, depths[cidx])
            if node[1] is not None:
                mid = mime_ids.setdefault(node[1], len(mime_ids))
                if mid == len(mimes):
                    mimes.append(node[1])
                emit[idx] = mid
        return CompiledTrie(
            transitions=transitions,
            emit=emit,
            mimes=tuple(mimes),
            max_depth=max_depth,
        )


@dataclass(frozen=True)
class CompiledTrie:
    """Flat-table form of the trie, safe to pickle into a Spark broadcast.

    ``classify_batch`` advances the whole batch through the tables in
    ``max_depth`` vectorized steps — the batch-level analogue of the
    per-payload early exit in MimeTypeTrie.cs:44-47.
    """

    transitions: np.ndarray  # (n_states, 256) int32, -1 = missing edge
    emit: np.ndarray  # (n_states,) int32, -1 = no mime at this node
    mimes: tuple[str, ...]
    max_depth: int

    def classify_batch(self, prefixes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Classify a batch of payload prefixes.

        Args:
            prefixes: (n, L) uint8 array, L >= max_depth, zero-padded.
            lengths: (n,) actual payload lengths (pre-truncation).

        Returns:
            (n,) int32 array of mime ids; -1 = no match.
        """
        n = prefixes.shape[0]
        state = np.zeros(n, dtype=np.int32)
        result = np.full(n, -1, dtype=np.int32)
        active = lengths > 0
        steps = min(self.max_depth, prefixes.shape[1])
        for i in range(steps):
            idx = np.flatnonzero(active & (lengths > i))
            if idx.size == 0:
                break
            nxt = self.transitions[state[idx], prefixes[idx, i]]
            dead = nxt < 0
            live = idx[~dead]
            active[idx[dead]] = False
            state[live] = nxt[~dead]
            em = self.emit[state[live]]
            hit = em >= 0
            result[live[hit]] = em[hit]
        return result

    def classify_bytes_batch(self, payloads: "list[bytes | None]") -> list:
        """Convenience: list of raw byte strings -> list of mime | None."""
        n = len(payloads)
        L = max(self.max_depth, 1)
        prefixes = np.zeros((n, L), dtype=np.uint8)
        lengths = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(payloads):
            if p:
                lengths[i] = len(p)
                head = p[:L]
                prefixes[i, : len(head)] = np.frombuffer(head, dtype=np.uint8)
        ids = self.classify_batch(prefixes, lengths)
        return [self.mimes[m] if m >= 0 else None for m in ids]


# -- production signature tables (reference parity) -------------------------

#: Strict 5-format table: PipelineNodeImageToUrl.cs:11-20.
STRICT_SIGNATURES: tuple[tuple[bytes, str], ...] = (
    (bytes.fromhex("FFD8FF"), "image/jpeg"),
    (bytes.fromhex("89504E470D0A1A0A"), "image/png"),
    (bytes.fromhex("474946383761"), "image/gif"),  # GIF87a
    (bytes.fromhex("474946383961"), "image/gif"),  # GIF89a
    (bytes.fromhex("52494646"), "image/webp"),  # RIFF container
    (bytes.fromhex("424D"), "image/bmp"),
)

#: Lenient table (superset, adopted for the pipeline): OcrRequestHandler.cs:125-137.
LENIENT_SIGNATURES: tuple[tuple[bytes, str], ...] = STRICT_SIGNATURES + (
    (bytes.fromhex("FFD8"), "image/jpeg"),  # 2-byte short form
    (bytes.fromhex("89504E47"), "image/png"),  # 4-byte short form
    (bytes.fromhex("00000100"), "image/x-icon"),
    (bytes.fromhex("49492A00"), "image/tiff"),  # II* little-endian
    (bytes.fromhex("4D4D002A"), "image/tiff"),  # MM* big-endian
    (bytes.fromhex("25504446"), "application/pdf"),  # %PDF
    (bytes.fromhex("0000001866747970"), "image/heic"),  # ....ftyp
)


def build_trie(signatures: tuple[tuple[bytes, str], ...]) -> MimeTypeTrie:
    trie = MimeTypeTrie()
    for sig, mime in signatures:
        trie.add(sig, mime)
    return trie


def strict_trie() -> MimeTypeTrie:
    return build_trie(STRICT_SIGNATURES)


def lenient_trie() -> MimeTypeTrie:
    return build_trie(LENIENT_SIGNATURES)


#: Max bytes the classifier ever needs from a payload (longest signature = 8;
#: 16 leaves headroom). Slice payloads to this length BEFORE any UDF so Spark
#: never ships full payloads into the Python worker (SURVEY.md §4 O1).
PREFIX_LEN = 16
