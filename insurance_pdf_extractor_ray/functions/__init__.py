"""Pure, reusable scalar/vector functions (no Ray dependency).

Everything here is deterministic and stateless so it can run inside
``map_batches`` tasks or actor pools without serialization surprises.
"""
