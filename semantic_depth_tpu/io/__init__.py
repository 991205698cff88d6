"""Host-side artifact IO: PLY export, result text files, visualization
geometry. Output formats are byte-compatible with the reference's writers."""
