"""Custom operator implementations where Pig semantics need more than a
one-line DataFrame call: cogroup, cube/rollup compat, global rank,
split/multi-store, nested foreach lowering, external streaming."""
