"""Command-line entry points (flag-compatible with the reference's
train_DyCON_* / test_* scripts)."""
