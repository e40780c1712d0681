"""Constants and schedules vs the reference's published limb values
(reference: src/fields/fp.rs:161-177, src/fields/fq2.rs, src/fields/fq6.rs,
src/fields/fq12.rs, src/groups/mod.rs:349-470)."""

import numpy as np

from bn_tpu import oracle as O
from bn_tpu import params as P


def u64(limbs):
    return P.u64x4_to_int(limbs)


def from_m(limbs):
    return P.from_mont(u64(limbs), P.Q)


def test_limb_roundtrip():
    for x in [0, 1, P.Q - 1, P.Q, (1 << 256) - 1, 1234567890123456789012345]:
        assert P.limbs_to_int(P.int_to_limbs(x)) == x
    arr = P.ints_to_limbs([0, 5, P.Q - 1])
    assert P.limbs_to_ints(arr) == [0, 5, P.Q - 1]


def test_montgomery_constants_match_reference():
    # Fr (fp.rs:161-168)
    assert u64([0x1BB8E645AE216DA7, 0x53FE3AB1E35C59E3, 0x8C49833D53BB8085, 0x0216D0B17F4E44A5]) == P.FR_R2
    assert u64([0x5E94D8E1B4BF0040, 0x2A489CBE1CFBB6B8, 0x893CC664A19FCFED, 0x0CF8594B7FCC657C]) == P.FR_R3
    assert u64([0xAC96341C4FFFFFFB, 0x36FC76959F60CD29, 0x666EA36F7879462E, 0x0E0A77C19A07DF2F]) == P.FR_R1
    assert P.FR_INV64 == 0xC2E1F593EFFFFFFF
    # Fq (fp.rs:170-177)
    assert u64([0xF32CFC5B538AFA89, 0xB5E71911D44501FB, 0x47AB1EFF0A417FF6, 0x06D89F71CAB8351F]) == P.FQ_R2
    assert u64([0xB1CD6DAFDA1530DF, 0x62F210E6A7283DB6, 0xEF7F0B0C0ADA0AFB, 0x20FD6E902D592544]) == P.FQ_R3
    assert P.FQ_INV64 == 0x87D20782E4866389


def test_modulus_decimal_strings():
    # the -1 == from_str(p-1) sanity of the reference (fields/mod.rs:68-71)
    assert P.R_SCALAR == 21888242871839275222246405745257275088548364400416034343698204186575808495617
    assert P.Q == 21888242871839275222246405745257275088696311157297823662689037894645226208583


def test_curve_constants_match_reference():
    assert from_m([0xA6BA871B8B1E1B3A, 0x14F1D651EB8E167B, 0xCCDD46DEF0F28C58, 0x1C14EF83340FBE5E]) == 2
    assert from_m([0x7A17CAA950AD28D7, 0x1F6AC17AE15521B9, 0x334BEA4E696BD284, 0x2A1F6744CE179D8E]) == 3
    gx = (
        from_m([0x8E83B5D102BC2026, 0xDCEB1935497B0172, 0xFBB8264797811ADF, 0x19573841AF96503B]),
        from_m([0xAFB4737DA84C6140, 0x6043DD5A5802D8C4, 0x09E950FC52A02F86, 0x14FEF0833AEA7B6B]),
    )
    gy = (
        from_m([0x619DFA9D886BE9F6, 0xFE7FD297F59E9B78, 0xFF9E1A62231B7DFE, 0x28FD7EEBAE9E4206]),
        from_m([0x64095B56C71856EE, 0xDC57F922327D3CBB, 0x55F935BE33351076, 0x0DA4A0E693FD6482]),
    )
    assert gx == P.G2_GEN_X and gy == P.G2_GEN_Y
    assert from_m([9781510331150239090, 15059239858463337189, 10331104244869713732, 2249375503248834476]) == P.TWO_INV
    tb = (
        from_m([0x3BF938E377B802A8, 0x020B1B273633535D, 0x26B7EDF049755260, 0x2514C6324384A86D]),
        from_m([0x38E7ECCCD1DCFF67, 0x65F0B37D93CE0D3E, 0xD749D0DD22AC00AA, 0x0141B9CE4A688D4D]),
    )
    assert tb == O.twist_b()


def test_frobenius_tables_match_reference():
    c1t, c2t, c12t = O.frob_coeffs()
    assert c1t[1] == (
        from_m([13075984984163199792, 3782902503040509012, 8791150885551868305, 1825854335138010348]),
        from_m([7963664994991228759, 12257807996192067905, 13179524609921305146, 2767831111890561987]),
    )
    assert c1t[2] == (
        from_m([3697675806616062876, 9065277094688085689, 6918009208039626314, 2775033306905974752]),
        0,
    )
    assert c1t[3] == (
        from_m([14532872967180610477, 12903226530429559474, 1868623743233345524, 2316889217940299650]),
        from_m([12447993766991532972, 4121872836076202828, 7630813605053367399, 740282956577754197]),
    )
    assert c2t[1] == (
        from_m([8314163329781907090, 11942187022798819835, 11282677263046157209, 1576150870752482284]),
        from_m([6763840483288992073, 7118829427391486816, 4016233444936635065, 2630958277570195709]),
    )
    assert c2t[2] == (
        from_m([8183898218631979349, 12014359695528440611, 12263358156045030468, 3187210487005268291]),
        0,
    )
    assert c12t[1] == (
        from_m([12653890742059813127, 14585784200204367754, 1278438861261381767, 212598772761311868]),
        from_m([11683091849979440498, 14992204589386555739, 15866167890766973222, 1200023580730561873]),
    )
    assert c12t[2] == (
        from_m([14595462726357228530, 17349508522658994025, 1017833795229664280, 299787779797702374]),
        0,
    )
    txc, tyc = O.twist_frob_coeffs()
    assert txc == c1t[1]
    assert tyc == (
        from_m([16482010305593259561, 13488546290961988299, 3578621962720924518, 2681173117283399901]),
        from_m([11661927080404088775, 553939530661941723, 7860678177968807019, 3208568454732775116]),
    )


def test_miller_schedule():
    flags = P.miller_schedule()
    assert len(flags) == 102  # reference invariant (src/groups/mod.rs:761)
    assert flags.count(0) == 64  # one doubling step per post-leading bit
    assert flags[-2:] == (1, 1)  # q1/q2 addition steps


def test_xi_and_nonresidue():
    assert P.FQ_NON_RESIDUE == P.Q - 1
    assert P.XI == (9, 1)
