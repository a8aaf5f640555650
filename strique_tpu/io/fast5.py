"""Fast5 raw-signal store: indexing, retrieval, extraction, in-place edits.

Re-implements the reference ``fast5Index`` (reference
STRique_lib/fast5Index.py:45-245) directly on h5py — the ont_fast5_api
dependency is replaced by a minimal native understanding of the two
container layouts:

  * single-read fast5: ``/Raw/**/Signal`` dataset, ``read_id`` attr on
    the Signal's parent group;
  * multi-read ("bulk") fast5: one top-level group per read (each with
    the single-read layout nested under it);
  * tar archives of single-read fast5 files.

Index lines are ``relpath[/read-group]\tread_id`` with paths relative to
the indexed directory, identical to the reference format.
"""
from __future__ import annotations

import glob
import os
import re
import shutil
import sys
import tarfile
import tempfile

import h5py
import numpy as np

_SPLIT_RE = re.compile(r"(\.fast5|\.tar)\/")


def _find_signal(group: h5py.Group) -> str | None:
    """Relative path of the Signal dataset below ``group`` (reference :64)."""
    return group.visit(lambda name: name if "Signal" in name else None)


def is_multi_read(f5_file: str) -> bool:
    """True for multi-read (bulk) fast5 layout."""
    with h5py.File(f5_file, "r") as f5:
        if "Raw" in f5:
            return False
        return any(isinstance(f5[k], h5py.Group) and "Raw" in f5[k] for k in f5)


def read_id_single(f5_file: str) -> str:
    """Read ID of a single-read fast5 (reference :62-65)."""
    with h5py.File(f5_file, "r") as f5:
        s = _find_signal(f5["/Raw/"])
        rid = f5["/Raw/" + s.rpartition("/")[0]].attrs["read_id"]
        return rid.decode() if isinstance(rid, bytes) else str(rid)


def read_ids_multi(f5_file: str) -> list[tuple[str, str]]:
    """(group, read ID) pairs of a multi-read fast5 (reference :67-74)."""
    out = []
    with h5py.File(f5_file, "r") as f5:
        for group in f5:
            s = _find_signal(f5[group + "/Raw/"])
            rid = f5[group + "/Raw/" + s.rpartition("/")[0]].attrs["read_id"]
            out.append((group, rid.decode() if isinstance(rid, bytes) else str(rid)))
    return out


def index(input_path: str, recursive: bool = False, output_prefix: str = "",
          tmp_prefix: str | None = None):
    """Yield ``path[\tgroup]\tread_id`` index lines (reference :137-179)."""
    if tmp_prefix and not os.path.exists(tmp_prefix):
        os.makedirs(tmp_prefix)
    input_files = []
    if os.path.isfile(input_path):
        input_files.append(input_path)
    elif recursive:
        input_files.extend(
            os.path.join(dirpath, f)
            for dirpath, _, files in os.walk(input_path)
            for f in files if f.endswith(".fast5") or f.endswith(".tar"))
    else:
        input_files.extend(glob.glob(os.path.join(input_path, "*.fast5")))
        input_files.extend(glob.glob(os.path.join(input_path, "*.tar")))
    for input_file in input_files:
        input_relative = os.path.normpath(os.path.join(
            output_prefix,
            os.path.dirname(os.path.relpath(input_file, start=input_path)),
            os.path.basename(input_file)))
        if input_file.endswith(".tar"):
            with tempfile.TemporaryDirectory(prefix=tmp_prefix) as tmpdirname, tarfile.open(input_file) as fp_tar:
                fp_tar.extractall(path=tmpdirname, filter="data")
                f5files = [os.path.join(dp, f) for dp, _, fs in os.walk(tmpdirname)
                           for f in fs if f.endswith(".fast5")]
                for f5file in f5files:
                    try:
                        rid = read_id_single(f5file)
                        yield "\t".join([os.path.normpath(os.path.join(
                            input_relative, os.path.relpath(f5file, start=tmpdirname))), rid])
                    except Exception:
                        print(f"[ERROR] Failed to open {f5file}, skip file for indexing", file=sys.stderr)
        elif is_multi_read(input_file):
            for group, rid in read_ids_multi(input_file):
                yield "\t".join((os.path.join(input_relative, group), rid))
        else:
            try:
                rid = read_id_single(input_file)
            except Exception:
                print(f"[ERROR] Failed to open {input_file}, skip file for indexing", file=sys.stderr)
                continue
            yield "\t".join([input_relative, rid])


class Fast5Index:
    """Random access to indexed raw signals (reference :46-56, 220-245)."""

    def __init__(self, index_file: str | None = None, tmp_prefix: str | None = None):
        self.index_file = index_file
        self.tmp_prefix = tmp_prefix
        if index_file and not os.path.exists(index_file):
            raise RuntimeError(f"[Error] Raw fast5 index file {index_file} not found.")
        if index_file:
            with open(index_file, "r") as fp:
                self.index_dict = {rid: path for path, rid in
                                   (line.split("\t") for line in fp.read().split("\n") if line)}
            self.index_dir = os.path.dirname(index_file)
        else:
            self.index_dict = None
            self.index_dir = None

    def __contains__(self, ID: str) -> bool:
        return bool(self.index_dict) and ID in self.index_dict

    def __len__(self) -> int:
        return len(self.index_dict or {})

    def _get_raw(self, f5_file: str, offset: str = "") -> np.ndarray:
        with h5py.File(f5_file, "r") as fp:
            grp = fp[os.path.join(offset, "Raw")]
            s = _find_signal(grp)
            return fp[os.path.join(offset, "Raw", s)][()]

    def _set_raw(self, f5_file: str, signal: np.ndarray, offset: str = "") -> None:
        with h5py.File(f5_file, "r+") as fp:
            grp = fp[os.path.join(offset, "Raw")]
            s = _find_signal(grp)
            path = os.path.join(offset, "Raw", s)
            del fp[path]
            ds = fp.create_dataset(path, data=signal)
            ds.parent.attrs["duration"] = len(signal)

    def get_raw(self, ID: str) -> np.ndarray | None:
        """Raw signal by read ID; routes on container type (reference :220-233)."""
        assert self.index_dict is not None
        if ID not in self.index_dict:
            raise RuntimeError(f"[Error] Read {ID} not found in {self.index_file}.")
        target = _SPLIT_RE.split(self.index_dict[ID])
        if len(target) == 1:  # single-read file
            return self._get_raw(os.path.join(self.index_dir, target[0]))
        if target[1] == ".fast5":  # bulk fast5
            return self._get_raw(os.path.join(self.index_dir, target[0] + ".fast5"), offset=target[2])
        with tempfile.TemporaryDirectory(prefix=self.tmp_prefix) as tmpdirname, \
                tarfile.open(os.path.join(self.index_dir, target[0] + ".tar")) as fp_tar:
            member = fp_tar.getmember(target[2])
            fp_tar.extract(member, path=tmpdirname, filter="data")
            return self._get_raw(os.path.join(tmpdirname, member.name))

    def set_raw(self, ID: str, signal: np.ndarray) -> None:
        """Replace a read's raw signal in place (reference :235-245)."""
        assert self.index_dict is not None
        if ID not in self.index_dict:
            raise RuntimeError(f"[Error] Read {ID} not found in {self.index_file}.")
        target = _SPLIT_RE.split(self.index_dict[ID])
        if len(target) == 1:
            self._set_raw(os.path.join(self.index_dir, target[0]), signal)
        elif target[1] == ".fast5":
            self._set_raw(os.path.join(self.index_dir, target[0] + ".fast5"), signal, offset=target[2])
        else:
            raise RuntimeError("[Error] setting raw signal only supported in single and bulk fast5.")

    # -- extraction --------------------------------------------------------
    def _copy_reads_to(self, read_ids, output: str) -> None:
        """Materialize a subset of reads as single-read fast5s (reference :96-135)."""
        import itertools

        if not os.path.exists(output):
            os.makedirs(output)
        batch_id_files = [tuple([rid] + _SPLIT_RE.split(self.index_dict[rid]))
                          for rid in read_ids if rid in self.index_dict]
        batch_id_files.sort(key=lambda x: (x[1], x[2]) if len(x) > 2 else (x[1], ""))
        for _, group in itertools.groupby(batch_id_files,
                                          key=lambda x: (x[1], x[2]) if len(x) > 2 else (x[1], "")):
            fofns = list(group)
            if len(fofns[0]) == 2:
                for rid, src in fofns:
                    shutil.copy(os.path.join(self.index_dir, src), output)
                continue
            _, batch_file, batch_ext, _ = fofns[0]
            if batch_ext == ".tar":
                members = {x[3] for x in fofns}
                with tarfile.open(os.path.join(self.index_dir, batch_file + ".tar")) as fp_tar:
                    for member in fp_tar.getmembers():
                        if any(s in member.name for s in members):
                            member.name = os.path.basename(member.name)
                            fp_tar.extract(member, path=output, filter="data")
            elif batch_ext == ".fast5":
                groups = {x[3] for x in fofns}
                src = os.path.join(self.index_dir, batch_file + ".fast5")
                with h5py.File(src, "r") as bulk:
                    for grp in groups:
                        rid = [x[0] for x in fofns if x[3] == grp][0]
                        out_file = os.path.join(output, f"{rid}.fast5")
                        multi_group_to_single(bulk, grp, out_file)

    def extract(self, input_path: str, output: str, format: str = "single") -> None:
        """Extract a batch / ID list into single or bulk fast5 (reference :181-218)."""
        if not os.path.exists(output):
            os.makedirs(output)
        batch_name, batch_ext = os.path.splitext(input_path)
        if batch_ext == ".tar":
            if format in ("single", "lazy"):
                with tarfile.open(input_path) as fp_tar:
                    fp_tar.extractall(path=output, filter="data")
            else:
                with tempfile.TemporaryDirectory(prefix=self.tmp_prefix) as tmp, tarfile.open(input_path) as fp_tar:
                    fp_tar.extractall(path=tmp, filter="data")
                    f5files = [os.path.join(dp, f) for dp, _, fs in os.walk(tmp)
                               for f in fs if f.endswith(".fast5")]
                    singles_to_multi(f5files, os.path.join(output, os.path.basename(batch_name) + ".fast5"))
        elif batch_ext == ".fast5":
            if format in ("bulk", "lazy"):
                shutil.copy(input_path, output)
            else:
                with h5py.File(input_path, "r") as bulk:
                    for grp in bulk:
                        rid = _group_read_id(bulk, grp)
                        multi_group_to_single(bulk, grp, os.path.join(output, f"{rid}.fast5"))
        elif batch_ext == ".txt":
            if not self.index_dict:
                raise RuntimeError("[Error] Extraction of reads from IDs without index file provided.")
            with open(input_path, "r") as fp:
                batch_ids = [x.strip() for x in fp.read().split("\n") if x]
            if format in ("single", "lazy"):
                self._copy_reads_to(batch_ids, output)
            else:
                with tempfile.TemporaryDirectory(prefix=self.tmp_prefix) as tmp:
                    self._copy_reads_to(batch_ids, tmp)
                    f5files = [os.path.join(dp, f) for dp, _, fs in os.walk(tmp)
                               for f in fs if f.endswith(".fast5")]
                    singles_to_multi(f5files, os.path.join(output, os.path.basename(batch_name) + ".fast5"))
        else:
            raise RuntimeError(f"[ERROR] Raw fast5 batch extension {batch_ext} not supported.")


def _group_read_id(bulk: h5py.File, group: str) -> str:
    s = _find_signal(bulk[group + "/Raw/"])
    rid = bulk[group + "/Raw/" + s.rpartition("/")[0]].attrs["read_id"]
    return rid.decode() if isinstance(rid, bytes) else str(rid)


def multi_group_to_single(bulk: h5py.File, group: str, out_file: str) -> None:
    """Copy one bulk read group into a standalone single-read fast5."""
    with h5py.File(out_file, "w") as out:
        for key in bulk[group]:
            bulk.copy(bulk[group][key], out, name=key)
        for k, v in bulk[group].attrs.items():
            out.attrs[k] = v


def singles_to_multi(f5_files, out_file: str) -> None:
    """Pack single-read fast5 files into one multi-read fast5."""
    with h5py.File(out_file, "w") as out:
        for f5_file in f5_files:
            with h5py.File(f5_file, "r") as src:
                rid = read_id_single(f5_file)
                grp = out.create_group(f"read_{rid}")
                for key in src:
                    src.copy(src[key], grp, name=key)
                for k, v in src.attrs.items():
                    grp.attrs[k] = v
