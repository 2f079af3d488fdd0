"""In-repo CIF parser (data/cif.py) vs hand-computed structures.

The reference parses CIF via pymatgen (mat2graph.py:121); pymatgen is not
installed here, so structure_from_cif falls back to our parser — these tests
cross-check it against structures computed by hand (VERDICT r3 next-round #6).
"""

import numpy as np
import pytest

from dostransformer_tpu.data.cif import (lattice_from_parameters, parse_cif)
from dostransformer_tpu.data.featurize_edos import structure_from_cif

NACL_P1 = """\
# generated using pymatgen
data_NaCl
_symmetry_space_group_name_H-M   'P 1'
_cell_length_a   5.64000000
_cell_length_b   5.64000000
_cell_length_c   5.64000000
_cell_angle_alpha   90.00000000
_cell_angle_beta   90.00000000
_cell_angle_gamma   90.00000000
_symmetry_Int_Tables_number   1
_chemical_formula_structural   NaCl
_chemical_formula_sum   'Na1 Cl1'
_cell_volume   179.40609600
_cell_formula_units_Z   1
loop_
 _symmetry_equiv_pos_site_id
 _symmetry_equiv_pos_as_xyz
  1  'x, y, z'
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_symmetry_multiplicity
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 _atom_site_occupancy
  Na  Na0  1  0.00000000  0.00000000  0.00000000  1
  Cl  Cl1  1  0.50000000  0.50000000  0.50000000  1
"""


class TestParseCif:
    def test_nacl_p1_hand_computed(self):
        d = parse_cif(NACL_P1)
        np.testing.assert_array_equal(d["numbers"], [11, 17])
        np.testing.assert_allclose(d["lattice"], np.eye(3) * 5.64, atol=1e-12)
        np.testing.assert_allclose(
            d["cart_coords"], [[0.0, 0.0, 0.0], [2.82, 2.82, 2.82]],
            atol=1e-12)

    def test_structure_from_cif_string_no_pymatgen(self):
        """The featurizer entry point must parse a literal CIF string with no
        pymatgen installed (it is not installed in this env)."""
        with pytest.raises(ImportError):
            import pymatgen  # noqa: F401
        numbers, coords, lattice = structure_from_cif(NACL_P1)
        np.testing.assert_array_equal(numbers, [11, 17])
        np.testing.assert_allclose(coords[1], [2.82, 2.82, 2.82], atol=1e-12)
        np.testing.assert_allclose(lattice, np.eye(3) * 5.64, atol=1e-12)

    def test_symmetry_expansion_and_dedup(self):
        """Inversion ops double the general site and fix the origin site;
        images are hand-computed."""
        cif = """\
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
 _symmetry_equiv_pos_as_xyz
 'x, y, z'
 '-x, -y, -z'
loop_
 _atom_site_type_symbol
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 O  0.25 0.25 0.25
 Si 0.00 0.00 0.00
"""
        d = parse_cif(cif)
        # O expands to (0.25,0.25,0.25) and (0.75,0.75,0.75); Si is its own
        # inversion image (dedup keeps one)
        np.testing.assert_array_equal(d["numbers"], [8, 8, 14])
        np.testing.assert_allclose(
            np.sort(d["cart_coords"][:2, 0]), [1.0, 3.0], atol=1e-12)
        np.testing.assert_allclose(d["cart_coords"][2], [0, 0, 0], atol=1e-12)

    def test_translation_symop_fractions(self):
        """'-y+1/2, x, z+0.5' applied to (0.1, 0.2, 0.3), hand-computed:
        (0.5-0.2, 0.1, 0.8) = (0.3, 0.1, 0.8)."""
        cif = """\
data_t
_cell_length_a 10
_cell_length_b 10
_cell_length_c 10
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
 _space_group_symop_operation_xyz
 '-y+1/2, x, z+0.5'
loop_
 _atom_site_label
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 C1 0.1 0.2 0.3
"""
        d = parse_cif(cif)
        np.testing.assert_array_equal(d["numbers"], [6])
        np.testing.assert_allclose(d["cart_coords"], [[3.0, 1.0, 8.0]],
                                   atol=1e-12)

    def test_hexagonal_lattice_hand_computed(self):
        """a=b=3, c=5, gamma=120: pymatgen's from_parameters convention puts
        a along +x and b at 120 deg in the xy-plane."""
        lat = lattice_from_parameters(3, 3, 5, 90, 90, 120)
        np.testing.assert_allclose(lat[0], [3, 0, 0], atol=1e-12)
        np.testing.assert_allclose(lat[1], [-1.5, 3 * np.sqrt(3) / 2, 0],
                                   atol=1e-12)
        np.testing.assert_allclose(lat[2], [0, 0, 5], atol=1e-12)

    def test_uncertainties_oxidation_states_comments(self):
        cif = """\
data_q  # trailing comment
_cell_length_a 5.4600(12)
_cell_length_b 5.4600(12)
_cell_length_c 5.4600(12)
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0
loop_
 _atom_site_type_symbol
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 Fe2+ 0.0 0.0 0.0
 O2-  0.5 0.5 0.5
"""
        d = parse_cif(cif)
        np.testing.assert_array_equal(d["numbers"], [26, 8])
        np.testing.assert_allclose(d["lattice"][0, 0], 5.46, atol=1e-12)

    def test_disordered_site_raises(self):
        cif = NACL_P1.replace("  Cl  Cl1  1  0.50000000  0.50000000  "
                              "0.50000000  1",
                              "  Cl  Cl1  1  0.50000000  0.50000000  "
                              "0.50000000  0.5")
        with pytest.raises(ValueError, match="occupancy"):
            parse_cif(cif)

    def test_missing_cell_raises(self):
        with pytest.raises(ValueError, match="cell"):
            parse_cif("data_x\nloop_\n _atom_site_fract_x\n 0.0\n")

    def test_wrap_dedup_across_boundary(self):
        """Images landing at 0.99995 and 0.00005 are the same site."""
        cif = """\
data_w
_cell_length_a 8
_cell_length_b 8
_cell_length_c 8
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
 _symmetry_equiv_pos_as_xyz
 'x, y, z'
 '-x, y, z'
loop_
 _atom_site_type_symbol
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 H 0.00005 0.25 0.25
"""
        d = parse_cif(cif)
        assert d["numbers"].shape == (1,)


class TestCifFeaturization:
    def test_build_sample_from_literal_cif(self):
        """End-to-end: literal CIF -> structure -> graph sample, pymatgen-free
        (the raw-CIF L1 ingestion path, mat2graph.py:77-122)."""
        from dostransformer_tpu.data.featurize_edos import (build_sample,
                                                            load_elem_feats)
        elem = load_elem_feats()
        numbers, coords, lattice = structure_from_cif(NACL_P1)
        y = np.abs(np.sin(np.linspace(0, 3, 201))) + 0.1
        s = build_sample(elem, numbers, coords, lattice, y=y, y_ft=y,
                         glob=[-1.0, -2.0], crystal_system="cubic",
                         band_gap=1.0, efermi=0.5, mp_id="mp-test",
                         sample_id=0)
        assert s.n_nodes == 2 + 1  # 2 atoms + prompt node
        assert s.x.shape[1] == elem.shape[1]
        assert np.isfinite(s.edge_attr).all()
