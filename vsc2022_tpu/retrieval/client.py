"""Python client for the resident retrieval server.

The server (``vsc2022_tpu.retrieval.serve``) speaks a line protocol
over stdin/stdout or TCP; this module wraps it so Python callers get
typed results instead of tab-separated strings. Two ways in:

    # Manage the server as a child process (stdio):
    with ServeClient.spawn("refs.npz", score_norm_features="noise.npz",
                           matches=True) as client:
        result = client.search("queries.npz")
        pairs = result.candidates()          # List[CandidatePair]
        client.add("more_refs.npz")          # grows the served corpus

    # Or attach to a running --listen server:
    with ServeClient.connect("127.0.0.1", 7845) as client:
        ...

The reference has no serving surface at all — its pipelines are batch
CLIs that rebuild the FAISS index per invocation (reference:
vsc/descriptor_eval_lib.py:27-60) — so this client, like the server,
is framework surface beyond parity. Results stay path-based (the
server writes CSVs; ``SearchResult.candidates()``/``matches()`` read
them back) so large result sets never squeeze through the pipe.

One request at a time per client: the protocol is strictly
request/response. For concurrent callers open one connection each
against a ``--listen`` server — sessions interleave server-side under
its device lock.
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import sys
from typing import List, Optional, Sequence, Tuple

from vsc2022_tpu.metrics import CandidatePair, Match


class ServeError(RuntimeError):
    """A request the server answered with ``error\\t<message>``."""


@dataclasses.dataclass
class SearchResult:
    """One answered search request (paths + counts + wall time)."""

    candidates_csv: str
    n_candidates: int
    matches_csv: Optional[str]
    n_matches: Optional[int]
    seconds: float

    def candidates(self) -> List[CandidatePair]:
        return CandidatePair.read_csv(self.candidates_csv)

    def matches(self) -> List[Match]:
        if self.matches_csv is None:
            raise ValueError(
                "server ran without --matches: no matches CSV to read"
            )
        return Match.read_csv(self.matches_csv)


@dataclasses.dataclass
class InbandSearchResult:
    """One answered in-band search (`search_features`): the result
    objects themselves — no filesystem involved on either side."""

    candidates: List[CandidatePair]
    matches: Optional[List[Match]]
    seconds: float


@dataclasses.dataclass
class ServeStats:
    """Live server state (the ``stats`` command)."""

    n_videos: int
    n_frames: int
    dtype: str
    sharded: bool
    matches: bool


class ServeClient:
    """Session against one resident server; not thread-safe."""

    def __init__(self, rfile, wfile, proc=None, sock=None):
        self._rfile = rfile
        self._wfile = wfile
        self._proc = proc
        self._sock = sock
        self.n_ref_videos, self.stage_seconds = self._read_ready()

    # -- constructors ------------------------------------------------

    @classmethod
    def spawn(
        cls,
        ref_features: str,
        *,
        score_norm_features: Optional[str] = None,
        ref_fine_features: Optional[str] = None,
        matches: bool = False,
        sharded: bool = False,
        bf16: bool = False,
        f32: bool = False,
        vcsl_faithful_tn: bool = False,
        no_warmup: bool = False,
        extra_args: Sequence[str] = (),
        env=None,
        cwd=None,
        stderr=None,
    ) -> "ServeClient":
        """Start ``python -m vsc2022_tpu.retrieval.serve`` as a child
        process and attach over its stdin/stdout. Keyword flags mirror
        the server CLI; anything else goes through ``extra_args``
        verbatim (e.g. ``["--beta", "1.5"]``). The child dies with the
        client (``close``/context-manager exit sends ``quit``)."""
        cmd = [
            sys.executable, "-m", "vsc2022_tpu.retrieval.serve",
            "--ref_features", os.path.abspath(ref_features),
        ]
        if score_norm_features:
            cmd += ["--score_norm_features", os.path.abspath(score_norm_features)]
        if ref_fine_features:
            cmd += ["--ref_fine_features", os.path.abspath(ref_fine_features)]
        for flag, on in [
            ("--matches", matches),
            ("--sharded", sharded),
            ("--bf16", bf16),
            ("--f32", f32),
            ("--vcsl_faithful_tn", vcsl_faithful_tn),
            ("--no_warmup", no_warmup),
        ]:
            if on:
                cmd.append(flag)
        cmd += list(extra_args)
        # Binary pipes: the in-band commands (search_features /
        # add_features / snapshot) move npz and CSV payload bytes over
        # the same stream as the text commands. PDEATHSIG: if the
        # spawning process is SIGKILLed (no `quit`, no __exit__), the
        # server must die too — an orphaned server keeps the TPU chip
        # lease and poisons every later backend init on this rig.
        from vsc2022_tpu.utils.procs import die_with_parent

        proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=stderr, env=env, cwd=cwd, preexec_fn=die_with_parent,
        )
        try:
            return cls(proc.stdout, proc.stdin, proc=proc)
        except BaseException:
            # Startup failed before the caller holds a handle: reap
            # the child here or it leaks (and may hold the chip).
            proc.kill()
            proc.wait()
            raise

    @classmethod
    def connect(
        cls, host: str, port: int, timeout: Optional[float] = None
    ) -> "ServeClient":
        """Attach to a running ``--listen HOST:PORT`` server.
        ``timeout`` bounds establishing the connection only — request
        replies block indefinitely (a cold-compile search can take
        minutes; a read timeout mid-protocol would desync replies)."""
        import socket

        sock = socket.create_connection((host, port), timeout=timeout)
        try:
            sock.settimeout(None)
            return cls(
                sock.makefile("rb"),
                sock.makefile("wb"),
                sock=sock,
            )
        except BaseException:
            sock.close()
            raise

    # -- protocol ----------------------------------------------------

    def _read_line(self) -> str:
        return self._rfile.readline().decode("utf-8", "replace").strip()

    def _write_line(self, line: str) -> None:
        self._wfile.write((line + "\n").encode("utf-8"))

    def _read_ready(self):
        line = self._read_line()
        parts = line.split("\t")
        if parts[0] != "ready":
            detail = f"expected ready line, got: {line!r}"
            if self._proc is not None and not line:
                # EOF: the child is dead or dying — reap it so the
                # error can carry the exit code.
                try:
                    code = self._proc.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    code = None
                detail += (
                    f" (server exited with code {code} during "
                    "startup — check its stderr)"
                )
            raise ServeError(detail)
        return int(parts[1]), float(parts[2])

    def _rpc(self, line: str, blobs: Sequence[bytes] = ()) -> List[str]:
        self._write_line(line)
        for blob in blobs:
            self._wfile.write(blob)
        self._wfile.flush()
        reply = self._read_line()
        if not reply:
            raise ServeError("server closed the connection")
        parts = reply.split("\t")
        if parts[0] == "error":
            raise ServeError("\t".join(parts[1:]))
        if parts[0] not in ("ok", "okb"):
            raise ServeError(f"malformed server reply: {reply!r}")
        return parts[1:]

    def _read_blob(self, n: int) -> bytes:
        blob = self._rfile.read(n)
        if len(blob) != n:
            raise ServeError(
                f"short server payload: expected {n} bytes, "
                f"got {len(blob)}"
            )
        return blob

    @staticmethod
    def _npz_bytes(features, dataset) -> bytes:
        import io

        from vsc2022_tpu.storage import store_features

        buf = io.BytesIO()
        store_features(buf, features, dataset)
        return buf.getvalue()

    # -- requests ----------------------------------------------------

    def search(
        self,
        query_features: str,
        *,
        query_fine_features: Optional[str] = None,
        candidates_csv: Optional[str] = None,
        matches_csv: Optional[str] = None,
    ) -> SearchResult:
        """Search one query npz; returns where the server wrote the
        CSVs (defaults: ``<query_npz>.candidates.csv``/``.matches.csv``).
        DnS servers need ``query_fine_features`` as well."""
        # Paths resolve in the SERVER process (which may have a
        # different cwd — spawn(cwd=...) or a remote --listen server
        # on a shared filesystem): anchor them to the caller's cwd.
        fields = [os.path.abspath(query_features)]
        if query_fine_features is not None:
            fields.append(os.path.abspath(query_fine_features))
        if candidates_csv is not None or matches_csv is not None:
            # An empty field tells the server "default path" (so the
            # matches CSV is nameable without naming the candidates).
            fields.append(
                os.path.abspath(candidates_csv) if candidates_csv else ""
            )
        if matches_csv is not None:
            fields.append(os.path.abspath(matches_csv))
        return self._parse_search_reply(self._rpc("\t".join(fields)))

    @staticmethod
    def _parse_search_reply(parts: List[str]) -> SearchResult:
        if len(parts) >= 5:
            return SearchResult(
                candidates_csv=parts[0], n_candidates=int(parts[1]),
                matches_csv=parts[2], n_matches=int(parts[3]),
                seconds=float(parts[4]),
            )
        return SearchResult(
            candidates_csv=parts[0], n_candidates=int(parts[1]),
            matches_csv=None, n_matches=None, seconds=float(parts[2]),
        )

    def add(
        self, ref_features: str, ref_fine_features: Optional[str] = None
    ) -> int:
        """Grow the served corpus; returns the number of videos added.
        DnS servers need the matching fine npz too."""
        fields = ["add", os.path.abspath(ref_features)]
        if ref_fine_features is not None:
            fields.append(os.path.abspath(ref_fine_features))
        parts = self._rpc("\t".join(fields))
        if parts[0] != "added":
            raise ServeError(f"unexpected add reply: {parts!r}")
        return int(parts[1])

    def remove(self, video_ids: Sequence[str]) -> Tuple[int, int]:
        """Drop reference videos from the served corpus; returns
        (videos removed, frame rows removed). The staged buffers
        compact device-side — post-remove results are bit-identical
        to a server freshly started over the survivors."""
        ids = [str(v) for v in video_ids]
        if not ids:
            raise ValueError("remove needs at least one video id")
        parts = self._rpc("\t".join(["remove"] + ids))
        if parts[0] != "removed":
            raise ServeError(f"unexpected remove reply: {parts!r}")
        return int(parts[1]), int(parts[2])

    def save(
        self, ref_features: str, ref_fine_features: Optional[str] = None
    ) -> int:
        """Snapshot the served corpus (after any adds/removes) to npz;
        returns the number of videos saved. Restarting a server on the
        snapshot reproduces the live state bit-for-bit. DnS servers
        need a second path for the fine features."""
        fields = ["save", os.path.abspath(ref_features)]
        if ref_fine_features is not None:
            fields.append(os.path.abspath(ref_fine_features))
        parts = self._rpc("\t".join(fields))
        if parts[0] != "saved":
            raise ServeError(f"unexpected save reply: {parts!r}")
        return int(parts[1])

    # -- end-to-end requests (resident model; server started with
    #    --baseline + --checkpoint_path) --------------------------------

    def extract(self, videos_dir: str, output_npz: str) -> Tuple[int, int]:
        """Decode + embed a video directory on the server's resident
        model, writing a descriptor npz. Returns (n_videos, n_frames).
        """
        parts = self._rpc(
            f"extract\t{os.path.abspath(videos_dir)}"
            f"\t{os.path.abspath(output_npz)}"
        )
        if parts[0] != "extracted":
            raise ServeError(f"unexpected extract reply: {parts!r}")
        return int(parts[1]), int(parts[2])

    def search_videos(
        self,
        videos_dir: str,
        *,
        candidates_csv: Optional[str] = None,
        matches_csv: Optional[str] = None,
    ) -> SearchResult:
        """Raw videos in, candidate/match CSVs out: the server embeds
        the directory on its resident model and searches in one
        request — query descriptors never touch disk."""
        fields = ["searchv", os.path.abspath(videos_dir)]
        if candidates_csv is not None or matches_csv is not None:
            fields.append(
                os.path.abspath(candidates_csv) if candidates_csv else ""
            )
        if matches_csv is not None:
            fields.append(os.path.abspath(matches_csv))
        return self._parse_search_reply(self._rpc("\t".join(fields)))

    # -- in-band requests (no shared filesystem needed) ---------------

    def search_features(
        self, queries, *, queries_fine=None
    ) -> InbandSearchResult:
        """Search a list of VideoFeature directly: the query npz bytes
        travel on the wire (`searchb`) and the result CSVs come back
        the same way, parsed into objects — a remote --listen server
        needs no shared filesystem. DnS servers need ``queries_fine``
        (the fine VideoFeatures, list or dict)."""
        import io

        from vsc2022_tpu.metrics import Dataset

        blobs = [self._npz_bytes(queries, Dataset.QUERIES)]
        if queries_fine is not None:
            fine = (
                list(queries_fine.values())
                if isinstance(queries_fine, dict) else list(queries_fine)
            )
            blobs.append(self._npz_bytes(fine, Dataset.QUERIES))
        header = "\t".join(
            ["searchb"] + [str(len(b)) for b in blobs]
        )
        parts = self._rpc(header, blobs=blobs)
        # okb\t<n_cand>\t<cand_len>[\t<n_matches>\t<match_len>]\t<s>
        cand_csv = self._read_blob(int(parts[1])).decode("utf-8")
        candidates = CandidatePair.read_csv(io.StringIO(cand_csv))
        matches = None
        if len(parts) >= 5:
            match_csv = self._read_blob(int(parts[3])).decode("utf-8")
            matches = Match.read_csv(io.StringIO(match_csv))
        return InbandSearchResult(
            candidates=candidates, matches=matches,
            seconds=float(parts[-1]),
        )

    def add_features(self, refs, refs_fine=None) -> int:
        """Grow the served corpus from VideoFeature lists directly
        (`addb`: the npz bytes travel on the wire). DnS servers need
        the matching fine features too."""
        from vsc2022_tpu.metrics import Dataset

        blobs = [self._npz_bytes(refs, Dataset.REFS)]
        if refs_fine is not None:
            fine = (
                list(refs_fine.values())
                if isinstance(refs_fine, dict) else list(refs_fine)
            )
            blobs.append(self._npz_bytes(fine, Dataset.REFS))
        header = "\t".join(["addb"] + [str(len(b)) for b in blobs])
        parts = self._rpc(header, blobs=blobs)
        if parts[0] != "added":
            raise ServeError(f"unexpected addb reply: {parts!r}")
        return int(parts[1])

    def snapshot(self):
        """Fetch the served corpus (after any adds/removes) as
        VideoFeature lists (`saveb`: the npz bytes come back on the
        wire). Returns (refs, refs_fine-or-None)."""
        import io

        from vsc2022_tpu.metrics import Dataset
        from vsc2022_tpu.storage import load_features

        parts = self._rpc("saveb")
        # okb\t<n_videos>\t<len_coarse>[\t<len_fine>]\t<seconds>
        refs = load_features(
            io.BytesIO(self._read_blob(int(parts[1]))), Dataset.REFS
        )
        fine = None
        if len(parts) >= 4:
            fine = load_features(
                io.BytesIO(self._read_blob(int(parts[2]))), Dataset.REFS
            )
        return refs, fine

    def probe(self, query_features: str) -> Tuple[float, float]:
        """Relay-jitter-free device-compute figure for a warm request
        at this query file's shapes: (search_s, tn_s) — the fused SN
        search dispatch and the TN alignment batches of the most
        recent request, each repetition-differenced inside one
        executable on the server (serve.py `probe`)."""
        parts = self._rpc(f"probe\t{os.path.abspath(query_features)}")
        if parts[0] != "probe":
            raise ServeError(f"unexpected probe reply: {parts!r}")
        return float(parts[1]), float(parts[2])

    def stats(self) -> ServeStats:
        parts = self._rpc("stats")
        if parts[0] != "stats":
            raise ServeError(f"unexpected stats reply: {parts!r}")
        return ServeStats(
            n_videos=int(parts[1]), n_frames=int(parts[2]),
            dtype=parts[3], sharded=bool(int(parts[4])),
            matches=bool(int(parts[5])),
        )

    # -- lifecycle ---------------------------------------------------

    def close(self, shutdown: bool = False) -> None:
        """End the session (``quit``); ``shutdown=True`` stops a TCP
        server entirely instead of just this session. Managed child
        processes are reaped (killed after 30 s if wedged)."""
        try:
            self._write_line("shutdown" if shutdown else "quit")
            self._wfile.flush()
        except (BrokenPipeError, ValueError, OSError):
            pass  # already gone
        if self._sock is not None:
            self._rfile.close()
            self._wfile.close()
            self._sock.close()
        if self._proc is not None:
            try:
                self._proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                self._proc.kill()
                self._proc.wait()

    def __enter__(self) -> "ServeClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
