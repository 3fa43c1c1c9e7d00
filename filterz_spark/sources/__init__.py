"""Input sources: deterministic synthetic pages table + testdata loaders."""
