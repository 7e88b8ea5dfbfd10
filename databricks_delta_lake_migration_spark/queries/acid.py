"""ACID/DML query surface — filled in once tables.logtable lands.

Each query here materializes a scratch log-table from fixture data,
runs a DML program (MERGE / UPDATE / DELETE / SCD2 / replaceWhere /
time travel / CDF), and returns the resulting table state; the oracle
reproduces the same final state declaratively in SQL.
"""
