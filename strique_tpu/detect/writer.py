"""TSV output writer (reference scripts/STRique.py:711-727)."""
from __future__ import annotations

import os

HEADER = ["ID", "target", "strand", "count", "score_prefix", "score_suffix",
          "log_p", "offset", "ticks", "mod"]


def processed_ids(path: str | None) -> set:
    """Read IDs already present in a count TSV (for resumable runs)."""
    if not path or not os.path.isfile(path):
        return set()
    out = set()
    with open(path, "r") as fp:
        for line in fp:
            if line.startswith("ID\t"):
                continue
            cols = line.split("\t", 1)
            if cols and cols[0]:
                out.add(cols[0])
    return out


class OutputWriter:
    def __init__(self, output_file: str | None = None, append: bool = False):
        self.output_file = output_file
        line = "\t".join(HEADER)
        if self.output_file:
            exists = os.path.isfile(output_file) and os.path.getsize(output_file) > 0
            if append and exists:
                pass  # never truncate prior results in resume mode
            else:
                with open(self.output_file, "w") as fp:
                    print(line, file=fp)
        else:
            print(line)

    def write_line(self, target_counts=()):
        if self.output_file:
            with open(self.output_file, "a") as fp:
                for tc in target_counts:
                    print("\t".join(str(x) for x in tc), file=fp)
        else:
            for tc in target_counts:
                print("\t".join(str(x) for x in tc), flush=True)
