"""Rule-for-rule KoG2P parity vs the reference implementation.

The GOLDEN table below was produced by running the reference pipeline
(``/root/reference/src/utils/KoG2P/g2p.py`` ``graph2prono`` with its full
``rulebook.txt``) over a lexicon chosen to exercise every documented
phonological process: the exception lexicon, cluster aspiration, the
five double-coda rule families, tensification, cluster simplification,
nasalization, l-resyllabification, liquidization, palatalization, simple
aspiration, liaison, coda neutralization, and multi-word liaison across
``#`` boundaries.  ``mlvae_tpu.utils.kog2p`` must reproduce each output
bit for bit.
"""
import pytest

from mlvae_tpu.utils.kog2p import (DEFAULT_RULES, g2p, g2p_prono,
                                   graph2phone)

GOLDEN = [
    # exception lexicon
    ("설익다", "s0 vv ll rr ii kf tt aa"),
    ("물고기", "mm uu ll kk oo k0 ii"),
    ("금요일", "k0 xx mm yo ii ll"),
    ("절약", "c0 vv rr ya kf"),
    ("닭", "t0 aa kf"),
    ("넓죽", "nn vv pf cc uu kf"),
    ("싫증", "s0 ii ll cc xx ng"),
    ("꽃잎", "kk oo nf nn ii pf"),
    ("맨입", "mm qq nf nn ii pf"),
    ("한여름", "h0 aa nf nn yv rr xx mf"),
    ("색연필", "s0 qq ng nn yv nf ph ii ll"),
    ("담요", "t0 aa mf nn yo"),
    ("식용유", "s0 ii k0 yo ng nn yu"),
    ("알약", "aa ll rr ya kf"),
    ("서울역", "s0 vv uu ll rr yv kf"),
    ("밟다", "p0 aa pf tt aa"),
    ("밟는", "p0 aa mf nn xx nf"),
    # h-cluster aspiration (ㄴㅎ / ㄹㅎ / ㄺ+ㅎ)
    ("좋다", "c0 oo th aa"),
    ("놓고", "nn oo kh oo"),
    ("많다", "mm aa nf th aa"),
    ("앓는", "aa ll rr xx nf"),
    ("끓는", "kk xx ll rr xx nf"),
    # double-coda simplification / liaison
    ("값", "k0 aa pf"),
    ("값이", "k0 aa pf ss ii"),
    ("없다", "vv pf tt aa"),
    ("읽다", "ii kf tt aa"),
    ("읽어", "ii ll k0 vv"),
    ("젊다", "c0 vv mf tt aa"),
    ("삶", "s0 aa mf"),
    ("핥다", "h0 aa ll tt aa"),
    ("외곬", "wo k0 oo ll"),
    ("읊다", "xx pf tt aa"),
    ("얹다", "vv nf tt aa"),
    ("얇다", "ya ll tt aa"),
    ("짧다", "cc aa ll tt aa"),
    # nasalization / liquidization
    ("독립", "t0 oo ng nn ii pf"),
    ("신라", "s0 ii ll rr aa"),
    ("국물", "k0 uu ng mm uu ll"),
    ("밥물", "p0 aa mf mm uu ll"),
    # palatalization
    ("같이", "k0 aa ch ii"),
    ("닫히다", "t0 aa ch ii t0 aa"),
    ("묻히다", "mm uu ch ii t0 aa"),
    ("굳이", "k0 uu c0 ii"),
    ("해돋이", "h0 qq t0 oo c0 ii"),
    ("붙이다", "p0 uu ch ii t0 aa"),
    # tensification
    ("학교", "h0 aa kf kk yo"),
    ("국밥", "k0 uu kf pp aa pf"),
    ("신고", "s0 ii nf kk oo"),
    ("안고", "aa nf kk oo"),
    ("젖살", "c0 vv tf ss aa ll"),
    ("있다", "ii tf tt aa"),
    ("옷고름", "oo tf kk oo rr xx mf"),
    ("낯설다", "nn aa tf ss vv ll t0 aa"),
    ("삯돈", "s0 aa kf tt oo nf"),
    ("닭장", "t0 aa kf cc aa ng"),
    # simple aspiration
    ("숱하게", "s0 uu th aa k0 ee"),
    ("급행", "k0 xx ph qq ng"),
    ("좁히다", "c0 oo ph ii t0 aa"),
    ("꽂히다", "kk oo ch ii t0 aa"),
    ("앉히다", "aa nf ch ii t0 aa"),
    # coda neutralization
    ("부엌", "p0 uu vv kf"),
    ("옷", "oo tf"),
    ("웃다", "uu tf tt aa"),
    ("꽃", "kk oo tf"),
    ("쫓다", "cc oo tf tt aa"),
    ("솥", "s0 oo tf"),
    ("뱉다", "p0 qq tf tt aa"),
    ("앞", "aa pf"),
    ("덮다", "t0 vv pf tt aa"),
    ("깎다", "kk aa kf tt aa"),
    ("키읔과", "kh ii xx kf kk wa"),
    # liaison
    ("한자어", "h0 aa nf c0 aa vv"),
    ("외국어", "wo k0 uu k0 vv"),
    ("먹었다", "mm vv k0 vv tf tt aa"),
    ("했습니다", "h0 qq tf ss xx mf nn ii t0 aa"),
    ("한국말", "h0 aa nf k0 uu ng mm aa ll"),
    ("안녕하세요", "aa nf nn yv ng h0 aa s0 ee yo"),
    ("감사합니다", "k0 aa mf s0 aa h0 aa mf nn ii t0 aa"),
    # multi-word: liaison/sandhi across '#' boundaries
    ("스물", "s0 xx mm uu ll"),
    ("여덟째", "yv t0 vv ll cc qq"),
    ("사람", "s0 aa rr aa mf"),
    ("스물 여덟째 사람", "s0 xx mm uu ll rr yv t0 vv ll cc qq s0 aa rr aa mf"),
    ("오늘 날씨 어때", "oo nn xx ll rr aa ll ss ii vv tt qq"),
    ("밥 먹었어", "p0 aa mf mm vv k0 vv ss vv"),
]


def test_full_rulebook_size():
    # every non-comment rulebook line (184 of the 212) is present, in order
    assert len(DEFAULT_RULES) == 184


@pytest.mark.parametrize("text,expected", GOLDEN,
                         ids=[t for t, _ in GOLDEN])
def test_reference_parity(text, expected):
    assert g2p_prono(text) == expected
    assert g2p(text) == expected.split()


def test_romanization_quirk_parity():
    # the reference's 'oh([# ]|$) -> ng' substitution consumes the word
    # boundary after a velar-nasal coda (leaving a syllable '-' instead of
    # the word '#'); graph2phone must reproduce it
    assert graph2phone("강 가") == "k0,aa,ng,-k0,aa,"
    assert graph2phone("한 국") == "h0,aa,nf,#k0,uu,kf,"
