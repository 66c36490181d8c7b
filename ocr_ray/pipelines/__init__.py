"""End-to-end pipeline assembly (Ray Data) + the pure-Python oracle."""
