"""Golden oracle: single-process reimplementation of the reference
crawler's semantics (deliberately NOT Spark). Used only by pytest."""
