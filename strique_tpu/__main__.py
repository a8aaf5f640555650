"""`python -m strique_tpu` == the strique CLI."""
from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
