"""Input sources: deterministic synthetic PDF corpus builders."""
