"""Sources: edge derivation, synthetic files table, RMAT, MatrixMarket."""
