"""Per-stage Parquet checkpoints with lineage sidecars (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference's only resumability is the accidental incremental JSONL
write (``ner/build_real_dataset.py:186-232``). Here it is explicit:

- each stage writes to ``{root}/{name}.tmp/`` then atomically renames to
  ``{root}/{name}/`` — a crashed write never looks complete;
- ``_lineage.json`` records per-file row counts + total + schema, so a
  resume (or an auditor) can verify a stage without recomputing it;
- ``Checkpointer.stage(name, fn)`` returns the checkpointed Dataset,
  recomputing only if the stage directory is absent.

At 100 TB the same layout holds: one directory per stage, many part
files (one per block), manifest small.

Object-store roots: pass a URI (``s3://bucket/ckpt``, ``file:///…``)
and every metadata operation routes through fsspec while the Parquet
data moves through Ray's native URI readers/writers — the plumbing a
real deployment needs on day one.  Plain paths keep the direct
os/shutil fast path.  NOTE for object stores without atomic directory
rename (S3): the ``.tmp`` → final rename is copy+delete under fsspec —
still crash-safe because ``is_done`` additionally verifies every
manifest-listed part file exists in the final dir (the copy is not
atomic and fsspec copies in sorted order, so the sidecar can land
before the data), just not instantaneous.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow.parquet as pq
import ray.data


def context_key(*parts) -> str:
    """Stable hash of the run context (config dataclass/dict + input
    path). A checkpoint computed under one context must not be resumed
    under another — e.g. a rerun with a different --match-threshold or
    --input would silently return stale stage outputs otherwise."""
    canon = json.dumps(
        [p.__dict__ if hasattr(p, "__dict__") else p for p in parts],
        sort_keys=True, default=str,
    )
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()[:16]


class Checkpointer:
    def __init__(self, root: str, context: str | None = None):
        """``context``: a ``context_key(...)`` string binding checkpoints
        to (config, input). None keeps the legacy existence-only resume
        (checkpoints then carry and ignore the key).  ``root`` may be a
        plain path or an fsspec URI (``file://``, ``s3://``, …)."""
        self.root = root
        self.context = context
        if "://" in root:
            import fsspec

            self._fs, self._root_path = fsspec.core.url_to_fs(root)
            self._proto = root.split("://", 1)[0]
        else:
            self._fs, self._root_path, self._proto = None, root, None
        self._makedirs(self._root_path)

    # ---- filesystem shims: local fast path OR fsspec ------------------
    def _makedirs(self, p: str) -> None:
        (self._fs.makedirs if self._fs else lambda x, exist_ok=True: os.makedirs(x, exist_ok=True))(p, exist_ok=True)

    def _exists(self, p: str) -> bool:
        return self._fs.exists(p) if self._fs else os.path.exists(p)

    def _isdir(self, p: str) -> bool:
        return self._fs.isdir(p) if self._fs else os.path.isdir(p)

    def _rmtree(self, p: str) -> None:
        if self._fs:
            self._fs.rm(p, recursive=True)
        elif os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)

    def _rename(self, src: str, dst: str) -> None:
        if self._fs:
            # no atomic dir rename on object stores: copy+delete; the
            # copy lands in sorted order so _lineage.json can precede
            # the data files — is_done() compensates by verifying every
            # manifest-listed part exists before declaring completeness
            self._fs.mv(src, dst, recursive=True)
        else:
            os.rename(src, dst)

    def _listdir(self, p: str) -> list:
        if self._fs:
            return sorted(x.rstrip("/").rsplit("/", 1)[-1] for x in self._fs.ls(p, detail=False))
        return sorted(os.listdir(p))

    def _open(self, p: str, mode: str = "r"):
        return self._fs.open(p, mode) if self._fs else open(p, mode)

    def _size(self, p: str) -> int:
        if self._fs:
            if self._fs.isdir(p):
                return sum(
                    i["size"]
                    for i in self._fs.find(p, detail=True).values()
                )
            return self._fs.size(p)
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fls in os.walk(p)
                for f in fls
            )
        return os.path.getsize(p)

    def _uri(self, p: str) -> str:
        """fs-native path → the URI Ray's readers/writers consume."""
        return f"{self._proto}://{p}" if self._fs else p

    @property
    def _pafs(self):
        """pyarrow filesystem kwarg for pq.* calls (None = local)."""
        return self._fs

    def _dir(self, name: str) -> str:
        return f"{self._root_path}/{name}" if self._fs else os.path.join(self.root, name)

    def is_done(self, name: str) -> bool:
        if not self._exists(f"{self._dir(name)}/_lineage.json"):
            return False
        lin = self.lineage(name) or {}
        if self._fs is not None:
            # fsspec rename is copy+delete (non-atomic) and copies in
            # sorted order — '_lineage.json' sorts before the hex part
            # names, so a crash mid-copy can leave the manifest present
            # with data files missing.  Completeness therefore requires
            # every manifest-listed part to exist, not just the sidecar.
            d = self._dir(name)
            try:
                present = set(self._listdir(d))
            except FileNotFoundError:
                return False
            if not set(lin.get("files", {})) <= present:
                return False
        if self.context is None:
            return True
        return lin.get("context_key") == self.context

    def stage(self, name: str, fn) -> ray.data.Dataset:
        """Return the Dataset for ``name``, computing+persisting it only
        if no completed checkpoint exists FOR THIS CONTEXT — a stage
        checkpointed under different config/input is recomputed, not
        silently reused."""
        final = self._dir(name)
        if self.is_done(name):
            return ray.data.read_parquet(self._uri(final))
        tmp = final + ".tmp"
        if self._exists(tmp):
            self._rmtree(tmp)
        if self._exists(final):  # incomplete (no lineage) → redo
            self._rmtree(final)
        ds = fn()
        t0 = time.time()
        ds.write_parquet(self._uri(tmp))
        lineage = self._collect_lineage(tmp)
        lineage["stage"] = name
        lineage["context_key"] = self.context
        lineage["write_seconds"] = round(time.time() - t0, 3)
        with self._open(f"{tmp}/_lineage.json", "w") as f:
            json.dump(lineage, f, indent=1)
        self._rename(tmp, final)
        return ray.data.read_parquet(self._uri(final))

    def _collect_lineage(self, path: str) -> dict:
        parts = {}
        total = 0
        schema = None
        for fname in self._listdir(path):
            if not fname.endswith(".parquet"):
                continue
            md = pq.read_metadata(f"{path}/{fname}", filesystem=self._pafs)
            parts[fname] = md.num_rows
            total += md.num_rows
            if schema is None:
                sch = pq.read_schema(f"{path}/{fname}", filesystem=self._pafs)
                schema = [f"{n}:{sch.field(n).type}" for n in sch.names]
        return {"rows": total, "files": parts, "schema": schema or []}

    def invalidate(self, name: str) -> None:
        final = self._dir(name)
        if self._exists(final):
            self._rmtree(final)

    def invariant_xor(self, name: str, column: str = "content_sha256"):
        """Order-insensitive MULTISET fingerprint of ``column`` across
        every part file of a checkpointed stage — the per-partition
        sha-xor of SURVEY §4: two stages carrying the same row set must
        agree, so an auditor can verify the invariant without recomputing
        the stage. Returns the (xor, sum, n_null, n_rows) tuple of
        ``state.compact.hex_multiset_fingerprint`` (vectorized; the sum
        component breaks XOR's paired-duplicate cancellation), or None
        if the stage is incomplete."""
        from address_parser_ray.state.compact import hex_multiset_fingerprint

        path = self._dir(name)
        if not self.is_done(name):
            return None
        acc = (0, 0, 0, 0)
        for fname in self._listdir(path):
            if not fname.endswith(".parquet"):
                continue
            t = pq.read_table(
                f"{path}/{fname}", columns=[column], filesystem=self._pafs
            )
            acc = hex_multiset_fingerprint(t[column], acc)
        return acc

    def vacuum(self, dry_run: bool = False, drop_stale: bool = False) -> dict:
        """Garbage-collect the checkpoint root — the lakehouse VACUUM:

        - leftover ``*.tmp`` stage dirs (crashed writes that never
          renamed; ``stage()`` would also clear them, but only when that
          stage reruns);
        - files inside COMPLETED stage dirs that the ``_lineage.json``
          manifest does not reference (orphans from a partial rewrite —
          they would otherwise be read back by ``read_parquet`` on
          resume, silently duplicating rows);
        - with ``drop_stale=True``: whole stage dirs whose recorded
          context_key mismatches this Checkpointer's context (outputs
          of a different config/input — never resumable here).

        Never touches ``_lineage.json`` itself or manifest-referenced
        part files, so a completed stage stays byte-identical.  Returns
        the report {tmp_dirs, orphan_files, stale_stages, bytes_freed};
        ``dry_run=True`` only reports."""
        report = {
            "tmp_dirs": [],
            "orphan_files": [],
            "stale_stages": [],
            "bytes_freed": 0,
        }

        for entry in self._listdir(self._root_path):
            path = f"{self._root_path}/{entry}" if self._fs else os.path.join(self.root, entry)
            if entry.endswith(".tmp"):
                report["tmp_dirs"].append(entry)
                report["bytes_freed"] += self._size(path)
                if not dry_run:
                    self._rmtree(path)
                continue
            if not self._isdir(path):
                continue
            lin = self.lineage(entry)
            if lin is None:
                continue  # incomplete dir: stage() owns its fate
            if (
                drop_stale
                and self.context is not None
                and lin.get("context_key") != self.context
            ):
                report["stale_stages"].append(entry)
                report["bytes_freed"] += self._size(path)
                if not dry_run:
                    self._rmtree(path)
                continue
            manifest = set(lin.get("files", {}))
            for fname in self._listdir(path):
                if fname == "_lineage.json" or fname in manifest:
                    continue
                fpath = f"{path}/{fname}"
                report["orphan_files"].append(f"{entry}/{fname}")
                report["bytes_freed"] += self._size(fpath)
                if not dry_run:
                    self._rmtree(fpath)
        return report

    @staticmethod
    def diff_stages(dir_a: str, dir_b: str, column: str | None = None) -> dict:
        """Digest-driven BACKFILL planning — compare two materialized
        stage dirs (e.g. a replica, a re-run, a restored backup) and
        return exactly which part files need re-shipping:
        ``{only_a, only_b, drifted, identical}``.  Cheap pass first
        (lineage row counts — manifest-only, no data read); when
        ``column`` is given, files with equal row counts are further
        compared by the order-insensitive multiset fingerprint of that
        column (the ``partition_digests`` primitive made actionable) —
        so a same-length content drift is still caught.  At 100 TB this
        is the anti-entropy reconciliation: ship only drifted
        partitions, not the dataset."""
        from address_parser_ray.state.compact import multiset_fingerprint

        def manifest(d: str) -> dict:
            with open(os.path.join(d, "_lineage.json")) as f:
                return json.load(f)["files"]

        fa, fb = manifest(dir_a), manifest(dir_b)
        only_a = sorted(set(fa) - set(fb))
        only_b = sorted(set(fb) - set(fa))
        drifted, identical = [], []
        for fname in sorted(set(fa) & set(fb)):
            if fa[fname] != fb[fname]:
                drifted.append(fname)
                continue
            if column is not None:
                ta = pq.read_table(os.path.join(dir_a, fname), columns=[column])
                tb = pq.read_table(os.path.join(dir_b, fname), columns=[column])
                if multiset_fingerprint(
                    ta[column], (0, 0, 0, 0)
                ) != multiset_fingerprint(tb[column], (0, 0, 0, 0)):
                    drifted.append(fname)
                    continue
            identical.append(fname)
        return {
            "only_a": only_a,
            "only_b": only_b,
            "drifted": drifted,
            "identical": len(identical),
        }

    def save_json(self, name: str, obj) -> None:
        """Persist a small JSON sidecar payload (e.g. the hot-key map the
        band index was salted with) atomically next to the stage dirs."""
        p = f"{self._root_path}/{name}.json" if self._fs else os.path.join(self.root, f"{name}.json")
        tmp = p + ".tmp"
        with self._open(tmp, "w") as f:
            json.dump({"context_key": self.context, "payload": obj}, f)
        if self._fs:
            self._fs.mv(tmp, p)
        else:
            os.replace(tmp, p)

    def load_json(self, name: str):
        """Read a payload written by :meth:`save_json`; None when absent
        or written under a different context (same rule as stages)."""
        p = f"{self._root_path}/{name}.json" if self._fs else os.path.join(self.root, f"{name}.json")
        if not self._exists(p):
            return None
        with self._open(p, "r") as f:
            rec = json.load(f)
        if self.context is not None and rec.get("context_key") != self.context:
            return None
        return rec.get("payload")

    def lineage(self, name: str) -> dict | None:
        p = f"{self._dir(name)}/_lineage.json"
        if not self._exists(p):
            return None
        with self._open(p, "r") as f:
            return json.load(f)
