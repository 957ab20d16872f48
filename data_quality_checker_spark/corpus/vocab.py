"""Seed vocabularies for the deterministic corpus generator and for the
offline training of the langid / perplexity models.

Two languages: English (target, keep) and Italian (the injected
wrong-language class — FIXTURES.md "seeded 2nd language"). Plain public
word lists.
"""

EN_VOCAB = (
    "the quick brown fox jumps over lazy dog and then runs back home "
    "where many people speak about weather today because it was sunny "
    "with light clouds near river while children play music under trees "
    "every morning brings new questions for science teachers who explain "
    "history numbers words sound recording quality data machine learning "
    "model audio transcript speaker voice clear noise signal sample rate "
    "duration second minute hour long short good great small large open "
    "close work house water food time year day night hand eye world life "
    "system part place case point government company number group problem "
    "fact right study book job business issue kind head far black both"
).split()

IT_VOCAB = (
    "il cane corre veloce nel parco mentre la gente parla del tempo oggi "
    "perché era molto bello con poche nuvole vicino al fiume dove i "
    "bambini giocano musica sotto gli alberi ogni mattina porta nuove "
    "domande per gli insegnanti di scienze che spiegano storia numeri "
    "parole suono registrazione qualità dati macchina apprendimento "
    "modello trascrizione voce chiara rumore segnale campione durata "
    "secondo minuto ora lungo breve buono grande piccolo aperto chiuso "
    "lavoro casa acqua cibo anno giorno notte mano occhio mondo vita "
    "sistema parte luogo caso punto governo azienda numero gruppo questo "
    "quella sono stato essere avere fare dire potere dovere volere sapere"
).split()

FIRST_NAMES = "alice bob carol dave erin frank grace heidi ivan judy".split()
DOMAINS = "example.com mail.test corp.example audio.example data.test".split()
