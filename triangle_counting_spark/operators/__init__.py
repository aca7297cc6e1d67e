"""Graph operators: orientation, adjacency, triangles, PageRank, CC, LP, BFS, stats."""
