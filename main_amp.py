#!/usr/bin/env python3
"""CLI-parity alias: the reference's training entry point is `main_amp.py`
(apex AMP naming). This framework's trainer lives in train.py; this shim
keeps `python main_amp.py DATA -c CFG --opt-level=O0 [--resume] [-e]`
working unchanged."""

from train import main

if __name__ == "__main__":
    main()
