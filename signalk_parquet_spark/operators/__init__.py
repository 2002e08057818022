"""Composed DataFrame operators — the engine's physical building blocks.
Each stays declarative (groupBy/window/join) so Catalyst picks the physical
strategy; pandas UDFs appear only where semantics demand sequential state
(EMA) or batch vectorization (minhash shingling)."""
