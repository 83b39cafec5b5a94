"""``python -m bayesgm_tpu`` delegates to the CLI (reference __main__.py)."""

from bayesgm_tpu.cli.cli import main

if __name__ == "__main__":
    main()
