from . import fusion, halo, mesh
