"""Engine operators: parse, cascade, seqgen, dedup/seen, attribution."""
