# Operator modules are imported explicitly (no eager re-export: keeps
# import graph acyclic — lake.table depends on operators.dedup).
