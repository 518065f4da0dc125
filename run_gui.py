#!/usr/bin/env python3
"""GUI launcher (counterpart of `/root/reference/run_gui.py:1-67`).

Checks dependencies, then starts the Tkinter app (menu / human play /
training / watch pages).
"""
import sys


def main() -> int:
    try:
        import tkinter  # noqa: F401
    except ImportError:
        print("error: tkinter is not available in this Python build.\n"
              "On Debian/Ubuntu: sudo apt install python3-tk", file=sys.stderr)
        return 1
    try:
        import jax  # noqa: F401
    except ImportError:
        print("error: jax is required — pip install jax", file=sys.stderr)
        return 1

    from gui.app import main as gui_main
    gui_main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
