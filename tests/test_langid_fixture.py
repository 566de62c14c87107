# -*- coding: utf-8 -*-
"""Held-out language-ID accuracy on real-orthography sentences.

The marker table is tuned on nothing -- these sentences are ordinary
prose in each language's REAL spelling (accents, punctuation), written
for this test and never consulted when picking markers (the markers are
naturally-ASCII function words).  lang_id_counts (occurrence-weighted,
punctuation-tolerant tokenizer) must classify essentially all of them;
the presence-bit lang_id is the cheap single-scan variant and gets a
looser bound.  Also locks marker-table hygiene: naturally-ASCII words
only, no duplicates within a language.
"""

from name_matching_spark.operators.textstats import (
    LANG_MARKERS,
    lang_id,
    lang_id_counts,
)

FIXTURE = [
    ("cs", "Myslím, že tento projekt je velmi důležitý pro naše město, "
           "ale nikdo neví, kdy bude hotový."),
    ("cs", "Byla to dlouhá cesta a jsme rádi, že jsme tak brzy doma."),
    ("cs", "Toto řešení funguje dobře, nebo se musí udělat jinak, aby "
           "bylo rychlejší."),
    ("da", "Jeg har ikke set den film, men han siger, at den er rigtig "
           "god."),
    ("da", "Hun gik til byen med sin ven, og de købte brød for pengene."),
    ("da", "Der er mange mennesker, som ikke har tid til at læse aviser."),
    ("de", "Der neue Plan wurde nicht sofort umgesetzt, weil die Kosten "
           "durch das Projekt deutlich gestiegen sind."),
    ("de", "Ein gutes Buch kann auch nach vielen Jahren noch eine große "
           "Wirkung haben."),
    ("de", "Sie hat sich auf die Prüfung vorbereitet, und das Ergebnis "
           "wird bald bekannt."),
    ("en", "The committee said that most of the results are from this "
           "year, which was a surprise."),
    ("en", "They have a plan that would improve the schools and their "
           "teachers."),
    ("en", "This is about the same idea that was discussed with the "
           "board."),
    ("es", "El gobierno anunció una nueva ley para proteger los bosques "
           "y las playas del país."),
    ("es", "Pero muy pocos saben cuando empezó esta tradición entre los "
           "pueblos."),
    ("es", "Los niños juegan en el parque con sus amigos por la tarde, "
           "como siempre."),
    ("fi", "Tämä on hyvä päivä, ja me menemme ulos, jos sää on kaunis."),
    ("fi", "Hän ei tiennyt, kun kaikki olivat jo lähteneet, mutta se "
           "oli myöhäistä."),
    ("fi", "Ne ovat vanhoja taloja, joka kadulla on oma historiansa, "
           "tai niin sanotaan."),
    ("fr", "Le président a annoncé que les réformes sont prévues pour "
           "la fin de cette année."),
    ("fr", "Il y a plus de personnes dans les rues qui ne sont pas "
           "d'accord avec le projet."),
    ("fr", "Cette maison est belle, mais elle n'est pas à vendre pour "
           "le moment."),
    ("hu", "Azt mondta, hogy nem tud eljönni, mert csak egy napja van "
           "a munkára."),
    ("hu", "Minden ember azt szeretné, hogy legyen egy jó élete, vagy "
           "legalább nyugalma."),
    ("hu", "Ez a város nagyon szép lesz, mint ahogy arra mindenki "
           "emlékszik."),
    ("id", "Pemerintah akan membangun jalan baru yang menghubungkan "
           "kota ini dengan desa-desa di sekitarnya."),
    ("id", "Dia tidak tahu bahwa acara itu sudah selesai dari kemarin."),
    ("id", "Buku ini juga tersedia untuk siswa yang ingin belajar pada "
           "malam hari, atau di akhir pekan."),
    ("it", "Il governo ha detto che le nuove regole sono necessarie per "
           "la sicurezza di tutti."),
    ("it", "Questo museo è ancora uno dei più importanti della città, "
           "come dicono anche i turisti."),
    ("it", "Siamo andati dal medico, che ci ha parlato della situazione "
           "nella regione."),
    ("nl", "De regering heeft een nieuw plan voor de scholen, maar niet "
           "iedereen is het ermee eens."),
    ("nl", "Het huis aan de gracht wordt volgend jaar verkocht, ook al "
           "is het oud."),
    ("nl", "Wij zijn met de trein naar Amsterdam gegaan, want deze "
           "route is sneller."),
    ("pl", "Nie wiem, czy to jest dobry pomysł, ale bardzo chcę "
           "spróbować."),
    ("pl", "Przez wiele lat mieszkał w małym domu, dla niego to było "
           "wszystko."),
    ("pl", "Tylko kiedy pada deszcz, jego kot siedzi w domu przez cały "
           "dzień oraz śpi."),
    ("pt", "Ele disse que a reunião foi muito boa, mas os resultados "
           "dos testes chegam depois."),
    ("pt", "Ela comprou uma casa com vista para o mar, e isso mudou a "
           "vida dos dois."),
    ("pt", "Quem estuda mais tem seus objetivos claros, pelo menos na "
           "maioria das vezes."),
    ("ro", "Acest oraș este cunoscut pentru clădirile sale vechi, care "
           "sunt vizitate de mulți turiști."),
    ("ro", "Nu știm unde vom merge acum, dar avem timp pentru toate."),
    ("ro", "Rezultatele au fost bune, chiar dacă proiectul nostru a "
           "început doar acum un an."),
    ("sv", "Det är inte lätt att hitta ett nytt jobb efter så många år "
           "i samma företag."),
    ("sv", "Han har en bil som kan köra under vatten, men den är "
           "mycket dyr."),
    ("sv", "Vi ska resa till Stockholm i sommar, om vädret blir bra."),
    ("tr", "Bu yeni proje ile daha fazla insan işe girecek ama süreç "
           "uzun olacak."),
    ("tr", "O kitap bir klasik olarak kabul ediliyor ve sonra birçok "
           "dile çevrildi."),
    ("tr", "Senin kadar hızlı koşamam ancak yine de denemek istiyorum, "
           "var mısın?"),
]


def _accuracy(spark, op):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(FIXTURE)],
        "doc_id long, lang string, text string")
    got = {r["id"]: r["lang_pred"]
           for r in op(df, "doc_id", "text").collect()}
    hits = sum(1 for i, (lang, _) in enumerate(FIXTURE)
               if got[i] == lang)
    return hits / len(FIXTURE)


def test_lang_id_counts_accuracy(spark):
    acc = _accuracy(spark, lang_id_counts)
    assert acc >= 0.95, acc


def test_lang_id_presence_accuracy(spark):
    # the single-scan presence variant misses punctuation-adjacent
    # markers by design; still must be far better than chance (1/16)
    acc = _accuracy(spark, lang_id)
    assert acc >= 0.6, acc


def test_counts_variant_not_worse_than_presence(spark):
    assert _accuracy(spark, lang_id_counts) >= _accuracy(spark, lang_id)


def test_marker_table_hygiene():
    for lang, words in LANG_MARKERS.items():
        assert len(lang) == 2
        assert len(words) == len(set(words)), f"{lang}: duplicate markers"
        for w in words:
            # naturally-ASCII words only: an ascii-folded marker (się ->
            # sie) never occurs in properly written text
            assert w.isascii() and w.islower() and w.isalpha(), (lang, w)
