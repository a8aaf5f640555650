"""TSV output writer (reference scripts/STRique.py:711-727)."""
from __future__ import annotations

HEADER = ["ID", "target", "strand", "count", "score_prefix", "score_suffix",
          "log_p", "offset", "ticks", "mod"]


class OutputWriter:
    def __init__(self, output_file: str | None = None):
        self.output_file = output_file
        line = "\t".join(HEADER)
        if self.output_file:
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
