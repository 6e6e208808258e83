"""Embedded per-language mini-corpora.

Used (a) by the fixture generator to synthesize transcripts and
(b) to train the deterministic hashed-n-gram language-ID and
perplexity models (FIXTURES.md §1: "5 small embedded word lists +
char-n-gram transition tables, seeded — enough signal for the hashed
n-gram langid/perplexity stages to separate languages cleanly").

No external data, no network; everything below is common public
vocabulary. The zh list is a set of frequent CJK characters combined
into 2-char "words" deterministically.
"""

from __future__ import annotations

import numpy as np

_EN = """the of and to in is was for that with you this have from they not
word time people water long little very after thing name year sound work
place number great where through before right follow came show also around
form three small another large must because turn here move like house
picture again change animal point mother world near build self earth father
head stand own page should country found answer school grow study still
learn plant cover food sun four between state keep never last let thought
city tree cross farm hard start might story""".split()

_ES = """el la de que y en un ser se no haber por con su para como estar
tener le lo todo pero más hacer o poder decir este ir otro ese si me ya ver
porque dar cuando muy sin vez mucho saber qué sobre mi alguno mismo yo
también hasta año dos querer entre así primero desde grande eso ni nos
llegar pasar tiempo ella sí día uno bien poco deber entonces poner cosa
tanto hombre parecer nuestro tan donde ahora parte después vida quedar
siempre creer hablar llevar dejar nada cada seguir menos nuevo encontrar
señor mundo casa niño agua""".split()

_DE = """der die und in den von zu das mit sich des auf für ist im dem
nicht ein eine als auch es an werden aus er hat dass sie nach wird bei
einer um am sind noch wie einem über einen so zum war haben nur oder aber
vor zur bis mehr durch man sein wurde sei schön wasser jahr zeit mensch
welt hand stadt kind tag frau haus weg auge wort name liebe kraft geist
arbeit leben ende land berg baum feld licht nacht morgen abend winter
sommer straße brücke fenster zimmer garten himmel erde feuer luft stimme
freund mutter vater bruder schwester""".split()

_FR = """le de un être et à il avoir ne je son que se qui ce dans en du
elle au pour pas vouloir sur faire plus dire me on mon lui nous comme mais
pouvoir avec tout y aller voir bien où sans tu ou leur homme si deux mari
moi vers femme venir quand grand celui même notre devoir là jour prendre
maintenant quelque temps très savoir falloir rien dont petit chose année
monde après trouver donner heure demander beaucoup nouveau rester porte
eau ciel terre nuit lumière cœur père mère frère sœur maison ville rue
jardin fenêtre arbre fleur oiseau chemin montagne rivière""".split()

_ZH_CHARS = (
    "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而"
    "要于就下得可你年生自会那后能对着事其里所去行过家十用发天如然作"
    "方成者多日都三小军二无同么经法当起与好看学进种将还分此心前面又"
    "定见只主没公从水长路明海花山春风月云雨雪火木石金门口手目耳"
)


def _zh_words() -> list[str]:
    rng = np.random.default_rng(7)
    chars = list(_ZH_CHARS)
    return ["".join(rng.choice(chars, size=2)) for _ in range(120)]


WORD_LISTS: dict[str, list[str]] = {
    "en": _EN,
    "es": _ES,
    "de": _DE,
    "fr": _FR,
    "zh": _zh_words(),
}

LANGS: tuple[str, ...] = tuple(sorted(WORD_LISTS))


def training_text(lang: str, n_sentences: int = 400, seed: int = 1234) -> list[str]:
    """Deterministic synthetic sentences for model training.

    NOTE: uses crc32, not Python hash() — hash() is salted per process
    (PYTHONHASHSEED), which would give every Spark worker a different
    model than the driver.
    """
    import zlib

    rng = np.random.default_rng(seed ^ zlib.crc32(lang.encode()))
    words = WORD_LISTS[lang]
    sep = "" if lang == "zh" else " "
    out = []
    for _ in range(n_sentences):
        n = int(rng.integers(4, 14))
        out.append(sep.join(rng.choice(words, size=n)))
    return out
