"""argparse CLIs mirroring the reference recipe-stage interface (jatts/bin/)."""
